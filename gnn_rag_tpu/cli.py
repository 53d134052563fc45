"""CLI for the GNN half — flag surface mirrors the reference
(gnn/main.py:12-47 + gnn/parsing.py:5-125): model-name subcommands
(ReaRev/NSM/GraftNet) plus shared data/optimisation flags, mapped onto the
typed Config dataclasses.

Usage:  python main.py ReaRev --entity_dim 50 --num_iter 3 --num_ins 2 \
            --num_gnn 3 --lm sbert --relation_word_emb True --data_folder ...
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .config import Config, DataConfig, ModelConfig, TrainConfig


def bool_flag(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def add_shared_args(parser):
    parser.add_argument("--name", default="webqsp", type=str)
    parser.add_argument("--data_folder", default="data/webqsp/", type=str)
    parser.add_argument("--max_train", default=200000, type=int)
    parser.add_argument("--word2id", default="vocab.txt", type=str)
    parser.add_argument("--relation2id", default="relations.txt", type=str)
    parser.add_argument("--entity2id", default="entities.txt", type=str)
    parser.add_argument("--entity_emb_file", default=None, type=str)
    parser.add_argument("--relation_emb_file", default=None, type=str)
    parser.add_argument("--relation_word_emb", default=True, type=bool_flag)
    parser.add_argument("--word_emb_file", default="word_emb.npy", type=str)
    parser.add_argument("--lm", default="lstm", type=str,
                        choices=["lstm", "bert", "roberta", "sbert", "t5",
                                 "sbert2", "simcse", "relbert"])
    parser.add_argument("--lm_frozen", default=1, type=int)
    parser.add_argument("--entity_dim", default=50, type=int)
    parser.add_argument("--kg_dim", default=100, type=int)
    parser.add_argument("--word_dim", default=300, type=int)
    parser.add_argument("--lm_dropout", default=0.3, type=float)
    parser.add_argument("--linear_dropout", default=0.2, type=float)
    parser.add_argument("--num_epoch", default=100, type=int)
    parser.add_argument("--warmup_epoch", default=0, type=int)
    parser.add_argument("--fact_scale", default=3, type=int)
    parser.add_argument("--eval_every", default=2, type=int)
    parser.add_argument("--batch_size", default=20, type=int)
    parser.add_argument("--gradient_clip", default=1.0, type=float)
    parser.add_argument("--lr", default=0.0005, type=float)
    parser.add_argument("--decay_rate", default=0.0, type=float)
    parser.add_argument("--seed", default=19960626, type=int)
    parser.add_argument("--label_smooth", default=0.1, type=float)
    parser.add_argument("--fact_drop", default=0, type=float)
    parser.add_argument("--is_eval", action="store_true")
    parser.add_argument("--checkpoint_dir", default="checkpoint/pretrain/", type=str)
    parser.add_argument("--experiment_name", default="", type=str)
    parser.add_argument("--load_experiment", default=None, type=str)
    parser.add_argument("--load_ckpt_file", default=None, type=str)
    parser.add_argument("--eps", default=0.95, type=float)
    parser.add_argument("--test_batch_size", default=20, type=int)
    parser.add_argument("--q_type", default="seq", type=str)
    # TPU-specific (new)
    parser.add_argument("--dp_size", default=1, type=int)
    parser.add_argument("--tp_size", default=1, type=int)
    parser.add_argument("--compute_dtype", default="float32", type=str)
    parser.add_argument("--profile_dir", default=None, type=str)
    parser.add_argument("--num_workers", default=0, type=int,
                        help="multiprocess JSONL ingest workers")
    parser.add_argument("--bucket_batches", default=False, type=bool_flag,
                        help="group shuffled batches by similar fact count "
                             "(cuts padding waste on skewed datasets like CWQ)")
    parser.add_argument("--info_attention", action="store_true",
                        help="fill the .info per-iteration slots with "
                             "instruction attention over question tokens "
                             "(opt-in; the shipped artifact has them empty)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("gnn_rag_tpu")
    sub = parser.add_subparsers(dest="model_name", required=True)

    p = sub.add_parser("ReaRev")
    p.add_argument("--alg", default="bfs", type=str)
    p.add_argument("--num_iter", default=2, type=int)
    p.add_argument("--num_ins", default=3, type=int)
    p.add_argument("--num_gnn", default=3, type=int)
    p.add_argument("--loss_type", default="kl", type=str)
    p.add_argument("--use_self_loop", default=True, type=bool_flag)
    p.add_argument("--normalized_gnn", default=False, type=bool_flag)
    p.add_argument("--norm_rel", action="store_true")
    p.add_argument("--pos_emb", action="store_true")
    add_shared_args(p)

    p = sub.add_parser("NSM")
    p.add_argument("--num_step", default=3, type=int)
    p.add_argument("--reason_kb", default=False, type=bool_flag)
    p.add_argument("--loss_type", default="kl", type=str)
    p.add_argument("--lambda_constrain", default=0.0, type=float)
    p.add_argument("--lambda_back", default=0.0, type=float)
    p.add_argument("--use_self_loop", default=True, type=bool_flag)
    p.add_argument("--use_inverse_relation", action="store_true")
    p.add_argument("--norm_rel", action="store_true")
    p.add_argument("--normalized_gnn", default=False, type=bool_flag)
    add_shared_args(p)

    p = sub.add_parser("GraftNet")
    p.add_argument("--pagerank_lambda", default=0.8, type=float)
    p.add_argument("--loss_type", default="bce", type=str)
    p.add_argument("--num_layer", default=3, type=int)
    p.add_argument("--use_inverse_relation", action="store_true")
    p.add_argument("--norm_rel", action="store_true")
    p.add_argument("--normalized_gnn", default=False, type=bool_flag)
    add_shared_args(p)

    return parser


def args_to_config(args: argparse.Namespace) -> Config:
    a = vars(args)
    get = a.get
    data = DataConfig(
        name=a["name"], data_folder=a["data_folder"], max_train=a["max_train"],
        word2id=a["word2id"], relation2id=a["relation2id"],
        entity2id=a["entity2id"], entity_emb_file=a["entity_emb_file"],
        relation_emb_file=a["relation_emb_file"],
        word_emb_file=a["word_emb_file"],
        relation_word_emb=a["relation_word_emb"], lm=a["lm"],
        use_inverse_relation=get("use_inverse_relation", False),
        use_self_loop=get("use_self_loop", True))
    model = ModelConfig(
        model_name=a["model_name"], entity_dim=a["entity_dim"],
        kg_dim=a["kg_dim"], word_dim=a["word_dim"], lm=a["lm"],
        lm_frozen=bool(a["lm_frozen"]), lm_dropout=a["lm_dropout"],
        linear_dropout=a["linear_dropout"], loss_type=get("loss_type", "kl"),
        label_smooth=a["label_smooth"], eps=a["eps"],
        alg=get("alg", "bfs"), num_iter=get("num_iter", 2),
        num_ins=get("num_ins", 3), num_gnn=get("num_gnn", 3),
        pos_emb=get("pos_emb", False), num_step=get("num_step", 3),
        reason_kb=get("reason_kb", False),
        lambda_constrain=get("lambda_constrain", 0.0),
        lambda_back=get("lambda_back", 0.0),
        num_layer=get("num_layer", 3),
        pagerank_lambda=get("pagerank_lambda", 0.8),
        fact_scale=a["fact_scale"], norm_rel=get("norm_rel", False),
        normalized_gnn=get("normalized_gnn", False),
        use_self_loop=get("use_self_loop", True),
        use_inverse_relation=get("use_inverse_relation", False),
        fact_drop=a["fact_drop"], compute_dtype=a["compute_dtype"])
    experiment_name = a["experiment_name"] or "{}-{}".format(
        a["name"], time.strftime("%Y%m%d-%H%M%S"))
    train = TrainConfig(
        num_epoch=a["num_epoch"], warmup_epoch=a["warmup_epoch"],
        eval_every=a["eval_every"], batch_size=a["batch_size"],
        test_batch_size=a["test_batch_size"],
        gradient_clip=a["gradient_clip"], lr=a["lr"],
        decay_rate=a["decay_rate"], seed=a["seed"], fact_drop=a["fact_drop"],
        checkpoint_dir=a["checkpoint_dir"], experiment_name=experiment_name,
        load_experiment=a["load_experiment"], is_eval=a["is_eval"],
        dp_size=a["dp_size"], tp_size=a["tp_size"],
        profile_dir=a["profile_dir"],
        bucket_batches=get("bucket_batches", False))
    return Config(data=data, model=model, train=train)


def assemble(argv=None, args=None) -> dict:
    """Parse flags, load data, encode relation/question texts, and build a
    Trainer (checkpoint restored when --load_experiment is set). Shared by
    the train/eval CLI (`run`) and the serving entrypoint
    (scripts/serve_qa.py). Returns {trainer, bundle, cfg, args, lm,
    rel_hidden, rel_hidden_inv, rel_mask}."""
    if args is None:
        args = build_parser().parse_args(argv)
    cfg = args_to_config(args)

    np.random.seed(cfg.train.seed)

    from .data.loader import load_dataset_dir
    from .models.frozen_lm import maybe_frozen_lm
    from .train.trainer import Trainer
    from .utils.logging import create_logger

    logger = create_logger("gnn_rag_tpu", cfg.train.checkpoint_dir,
                           config=cfg.model)
    bundle = load_dataset_dir(cfg,
                              num_workers=getattr(args, "num_workers", 0))
    vocab = bundle["vocab"]

    rel_hidden = rel_hidden_inv = rel_mask = None
    lm = None
    lm_source = None
    if cfg.data.relation_word_emb and bundle["rel_tokens"] is not None:
        lm = maybe_frozen_lm(cfg.model.lm, cfg.model.word_dim_effective,
                             seed=cfg.train.seed, logger=logger)
        lm_source = lm.weight_source
        if cfg.model.lm != "lstm" and not cfg.model.lm_frozen:
            # lm_frozen=0: the in-model encoder must match the loaded
            # weights exactly or seed_submodule cannot overlay them — pin
            # its hyperparameters from the actual module (ADVICE r2 #1)
            from .models.encoders import TransformerQuestionEncoder
            m = lm.module
            if not isinstance(m, TransformerQuestionEncoder):
                raise SystemExit(
                    f"--lm_frozen 0 only supports bert-family encoders; "
                    f"{cfg.model.lm!r} loaded a {type(m).__name__}")
            import dataclasses as _dc
            spec = (m.vocab_size, m.hidden, m.layers, m.heads,
                    m.intermediate, m.max_len, m.position_style, m.pad_idx)
            cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                     lm_spec=spec))
        pad = bundle["tokenizer"].pad_id
        rel_hidden = lm.encode(bundle["rel_tokens"], pad_id=pad)
        rel_hidden_inv = lm.encode(bundle["rel_tokens_inv"], pad_id=pad)
        rel_mask = (bundle["rel_tokens"] != pad).astype(np.float32)
        if cfg.model.lm != "lstm" and cfg.model.lm_frozen:
            # lm_frozen=1 (reference default): encode questions ONCE here and
            # feed precomputed hidden states to the jitted step. With
            # --lm_frozen 0 the in-model TransformerQuestionEncoder runs
            # inside the step and trains (bert_encoder.py:80-83); its params
            # are seeded from the same frozen-LM weights below.
            for split in ("train", "valid", "test"):
                ds = bundle[split]
                if ds is None:
                    continue
                hid = lm.encode(
                    np.stack([np.pad(r.q_token_ids,
                                     (0, max(0, 64 - len(r.q_token_ids))))
                              [:64] for r in ds.records]),
                    pad_id=pad)
                ds.q_hidden = [hid[i, :len(r.q_token_ids)]
                               for i, r in enumerate(ds.records)]

    # pretrained (frozen) embedding tables, padded with one extra row
    # (base_model.py:79-114)
    def load_padded(fname):
        if not fname:
            return None
        path = os.path.join(cfg.data.data_folder, fname)
        if not os.path.exists(path):
            return None
        emb = np.load(path)
        return np.pad(emb, ((0, 1), (0, 0))).astype(np.float32)

    entity_emb = load_padded(cfg.data.entity_emb_file)
    word_emb = load_padded(cfg.data.word_emb_file) if cfg.model.lm == "lstm" else None

    # frozen pretrained KG relation table (base_model.py:122-134, 153-162);
    # only consulted when relation texts are off, like the reference
    relation_emb = None
    if cfg.data.relation_emb_file:
        from .data.loader import load_relation_emb
        relation_emb = load_relation_emb(
            os.path.join(cfg.data.data_folder, cfg.data.relation_emb_file),
            bundle["num_kb_relation"], cfg.data.use_inverse_relation,
            cfg.data.use_self_loop)
        if relation_emb is None:
            logger.info("relation_emb_file row mismatch: random init "
                        "(base_model.py:127-128)")

    # tokenizer-decoded question strings in .info (evaluate.py:143-156 quirk:
    # the reference writes the DECODED token sequence, not the raw question)
    decode_question = None
    tok = bundle["tokenizer"]
    if hasattr(tok, "tok"):  # HFTokenizer
        def decode_question(ids):
            words = tok.tok.convert_ids_to_tokens([int(i) for i in ids])
            return "".join(w + " " for w in words
                           if w not in ("[CLS]", "[SEP]", "[PAD]"))
    elif hasattr(tok, "word2id"):  # LSTMWordTokenizer
        id2word = {i: w for w, i in tok.word2id.items()}

        def decode_question(ids):
            return "".join(id2word[int(i)] + " " for i in ids
                           if int(i) in id2word)

    mesh = None
    if cfg.train.dp_size * cfg.train.tp_size > 1:
        from .parallel.mesh import make_mesh
        mesh = make_mesh(dp=cfg.train.dp_size, tp=cfg.train.tp_size)
        logger.info("mesh: dp=%d tp=%d", cfg.train.dp_size, cfg.train.tp_size)

    trainer = Trainer(
        cfg, train_data=bundle["train"], valid_data=bundle["valid"],
        test_data=bundle["test"], num_entity=vocab.num_entity,
        num_kb_relation=bundle["num_kb_relation"],
        num_word=len(vocab.word2id),
        rel_hidden=rel_hidden, rel_hidden_inv=rel_hidden_inv,
        rel_text_mask=rel_mask, entity_emb=entity_emb, word_emb=word_emb,
        relation_emb=relation_emb,
        id2entity=vocab.id2entity, logger=logger,
        decode_question=decode_question, mesh=mesh, lm_source=lm_source)

    if (cfg.model.lm != "lstm" and not cfg.model.lm_frozen
            and rel_hidden is not None):
        # seed the trainable in-model LM from the same (HF or deterministic)
        # weights the frozen path uses, then finetune (bert_encoder.py:80-83)
        trainer.seed_submodule("lm", lm.params)

    if cfg.train.load_experiment:
        trainer.load_ckpt(os.path.join(cfg.train.checkpoint_dir,
                                       cfg.train.load_experiment))
    return {"trainer": trainer, "bundle": bundle, "cfg": cfg, "args": args,
            "lm": lm, "rel_hidden": rel_hidden,
            "rel_hidden_inv": rel_hidden_inv, "rel_mask": rel_mask}


def run(argv=None) -> None:
    ctx = assemble(argv)
    trainer, cfg, args = ctx["trainer"], ctx["cfg"], ctx["args"]
    if cfg.train.is_eval:
        trainer.evaluate_single(
            write_attention=getattr(args, "info_attention", False))
    else:
        trainer.train(0, cfg.train.num_epoch - 1)
