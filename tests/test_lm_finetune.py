"""--lm_frozen 0: the question LM runs INSIDE the jitted train step and
trains (reference bert_encoder.py:80-83; parsing.py --lm_frozen flag).

With lm_frozen=1 (default) questions are encoded once by the frozen LM and
the step consumes precomputed hidden states; with 0 the in-model
TransformerQuestionEncoder is seeded from the same weights and finetuned.
"""

import pytest
import jax
import numpy as np

from tests.test_cli_e2e import write_micro_dataset


def _build_trainer(tmp_path, lm_frozen):
    data_dir = tmp_path / "data"
    if not data_dir.exists():
        data_dir.mkdir()
        write_micro_dataset(data_dir)
    from gnn_rag_tpu.cli import args_to_config, build_parser
    from gnn_rag_tpu.data.loader import load_dataset_dir
    from gnn_rag_tpu.models.frozen_lm import maybe_frozen_lm
    from gnn_rag_tpu.train.trainer import Trainer
    args = build_parser().parse_args(
        ["ReaRev", "--data_folder", str(data_dir) + "/",
         "--checkpoint_dir", str(tmp_path / "ckpt"),
         "--experiment_name", f"lmf{lm_frozen}",
         "--lm", "sbert", "--entity_dim", "16",
         "--num_iter", "2", "--num_ins", "2", "--num_gnn", "2",
         "--num_epoch", "1", "--batch_size", "4", "--test_batch_size", "4",
         "--lm_frozen", str(lm_frozen), "--relation_word_emb", "True"])
    cfg = args_to_config(args)
    bundle = load_dataset_dir(cfg)
    lm = maybe_frozen_lm(cfg.model.lm, cfg.model.word_dim_effective,
                         seed=cfg.train.seed)
    pad = bundle["tokenizer"].pad_id
    rel_hidden = lm.encode(bundle["rel_tokens"], pad_id=pad)
    rel_hidden_inv = lm.encode(bundle["rel_tokens_inv"], pad_id=pad)
    rel_mask = (bundle["rel_tokens"] != pad).astype(np.float32)
    if lm_frozen:
        for split in ("train", "valid", "test"):
            ds = bundle[split]
            hid = lm.encode(
                np.stack([np.pad(r.q_token_ids,
                                 (0, max(0, 64 - len(r.q_token_ids))))[:64]
                          for r in ds.records]), pad_id=pad)
            ds.q_hidden = [hid[i, :len(r.q_token_ids)]
                           for i, r in enumerate(ds.records)]
    tr = Trainer(cfg, train_data=bundle["train"], valid_data=bundle["valid"],
                 test_data=bundle["test"],
                 num_entity=bundle["vocab"].num_entity,
                 num_kb_relation=bundle["num_kb_relation"],
                 num_word=len(bundle["vocab"].word2id),
                 rel_hidden=rel_hidden, rel_hidden_inv=rel_hidden_inv,
                 rel_text_mask=rel_mask)
    return tr, lm


@pytest.mark.e2e
def test_lm_finetune_trains_the_encoder(tmp_path):
    tr, lm = _build_trainer(tmp_path, lm_frozen=0)
    # the in-model LM exists and is seeded from the frozen weights
    assert "lm" in tr.params["params"]
    tr.seed_submodule("lm", lm.params)
    tok0 = np.asarray(tr.params["params"]["lm"]["tok_emb"]["embedding"])
    np.testing.assert_allclose(
        tok0, np.asarray(lm.params["params"]["tok_emb"]["embedding"]))
    before = jax.tree_util.tree_map(np.asarray, tr.params["params"]["lm"])
    loss, _, _ = tr.train_epoch()
    assert np.isfinite(loss)
    after = tr.params["params"]["lm"]
    # gradients flowed into the encoder: at least one leaf changed
    changed = jax.tree_util.tree_reduce(
        lambda acc, ab: acc or bool(np.any(ab)), jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) != np.asarray(b), before, after),
        False)
    assert changed


@pytest.mark.e2e
def test_lm_frozen_has_no_inmodel_lm(tmp_path):
    tr, _ = _build_trainer(tmp_path, lm_frozen=1)
    assert "lm" not in tr.params["params"]
    loss, _, _ = tr.train_epoch()
    assert np.isfinite(loss)
