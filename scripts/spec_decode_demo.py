"""Speculative-decoding study: trained draft + trained target, real prompts.

Measures the single-prompt (bs=1) serving win of draft-and-verify decoding
(`llm_tpu.generate.SpeculativeDecoder`) with two TRAINED reader bundles that
share one vocabulary (train the target with `train_reader.py --vocab_from
<draft>/vocab.json`). Prompts come from the same serving-distribution
PromptBuilder path the RAG driver uses, so acceptance rates reflect real
reader traffic, not toy strings.

For every prompt the script runs plain greedy decoding on the target and
speculative decoding (target + draft), asserts token-exact parity (the
decoder's contract), and records wall time plus the decoder's own
`last_stats` (target forwards, accepted draft tokens). Output JSON rows:
per-gamma aggregate tok/s for both modes, acceptance rate, and the
target-forwards compression factor.

The reference serves its reader through HF pipelines token-by-token
(llm/src/llms/language_models/llama.py:15-36); this path is a new
capability on top of parity.

Usage (on-chip):
  python scripts/spec_decode_demo.py --target checkpoints/reader_big \
      --draft checkpoints/reader_tiny_kp --n 24 --gammas 2,4,6 \
      --out /tmp/spec_decode_demo.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_prompts(data_dir: str, split: str, tok, budget: int, n: int,
                  keep_parallel: bool, seed: int = 13) -> list:
    """Serving-distribution prompts: candidate-path QA inputs for the first
    `n` questions of `split`, same builder configuration as rag.predict."""
    from gnn_rag_tpu.rag.prompt_builder import PromptBuilder

    rng = np.random.default_rng(seed)
    builder = PromptBuilder("prompts/llama2_predict.txt", add_rule=False,
                            maximun_token=budget,
                            tokenize=lambda t: len(tok.encode(t)),
                            keep_parallel=keep_parallel)
    prompts = []
    with open(os.path.join(data_dir, f"{split}.json")) as f:
        for line in f:
            if len(prompts) >= n:
                break
            q = json.loads(line)
            answers = [a["text"] for a in q["answers"]]
            ents = q["subgraph"]["entities"]
            distractors = [ents[i] for i in
                           rng.integers(0, len(ents), 3).tolist()]
            cand = answers + [d for d in distractors if d not in answers]
            prompts.append(builder.process_input(
                {"id": q["id"], "question": q["question"],
                 "answer": answers, "q_entity": q["entities"],
                 "a_entity": answers, "graph": q["subgraph"]["tuples"],
                 "cand": cand, "choices": []}))
    return prompts


def load_bundle(path: str):
    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.utils.checkpoint import load_pytree

    with open(os.path.join(path, "config.json")) as f:
        cfg = LlamaConfig(**json.load(f))
    model = LlamaLM(cfg)
    dummy = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    params = load_pytree(os.path.join(path, "checkpoint"), dummy)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    return model, params, cfg, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True,
                    help="reader bundle dir (checkpoint/ config.json "
                         "vocab.json) — the model whose output is served")
    ap.add_argument("--draft", required=True,
                    help="smaller reader bundle sharing the target's vocab")
    ap.add_argument("--data", default="data/synthqsp")
    ap.add_argument("--split", default="test")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--gammas", default="2,4,6",
                    help="comma-separated speculation depths to sweep")
    ap.add_argument("--max_new", type=int, default=24)
    ap.add_argument("--keep_parallel", action="store_true")
    ap.add_argument("--out", default="/tmp/spec_decode_demo.json")
    args = ap.parse_args()

    from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder
    from gnn_rag_tpu.rag.llms.llama_tpu import WordTokenizer

    tok = WordTokenizer.load(os.path.join(args.target, "vocab.json"))
    tmodel, tparams, tcfg, tn = load_bundle(args.target)
    dmodel, dparams, dcfg, dn = load_bundle(args.draft)
    assert tcfg.vocab_size == dcfg.vocab_size, (
        "target/draft vocab mismatch: train the target with "
        f"--vocab_from {args.draft}/vocab.json ({tcfg.vocab_size} vs "
        f"{dcfg.vocab_size})")
    log(f"target: dim {tcfg.dim} x {tcfg.n_layers}L = {tn/1e6:.1f}M params; "
        f"draft: dim {dcfg.dim} x {dcfg.n_layers}L = {dn/1e6:.1f}M")

    gammas = [int(g) for g in args.gammas.split(",")]
    budget = tcfg.max_seq_len - args.max_new - max(gammas) - 9
    prompts = build_prompts(args.data, args.split, tok, budget, args.n,
                            args.keep_parallel)
    enc = [tok.encode(p)[-budget:] for p in prompts]
    log(f"{len(enc)} prompts, median len "
        f"{int(np.median([len(e) for e in enc]))} tokens")

    plain = Decoder(tmodel, tparams, max_len=tcfg.max_seq_len)
    # warm the plain-greedy compile, then time it
    base_out = []
    plain.greedy(enc[0], max_new_tokens=args.max_new, eos_id=tok.eos_id)
    t0 = time.time()
    for e in enc:
        base_out.append(plain.greedy(e, max_new_tokens=args.max_new,
                                     eos_id=tok.eos_id))
    base_wall = time.time() - t0
    base_toks = sum(len(o) for o in base_out)
    log(f"plain greedy: {base_toks} tokens in {base_wall:.1f}s "
        f"({base_toks/base_wall:.1f} tok/s)")

    rows = []
    for gamma in gammas:
        spec = SpeculativeDecoder(tmodel, tparams, dmodel, dparams,
                                  max_len=tcfg.max_seq_len, gamma=gamma)
        spec.greedy(enc[0], max_new_tokens=args.max_new, eos_id=tok.eos_id)
        n_fwd = n_acc = n_tok = mismatches = 0
        t0 = time.time()
        outs = []
        for e in enc:
            outs.append(spec.greedy(e, max_new_tokens=args.max_new,
                                    eos_id=tok.eos_id))
            st = spec.last_stats
            n_fwd += st["target_forwards"]
            n_acc += st["draft_accepted"]
            n_tok += st["tokens"]
        wall = time.time() - t0
        mismatches = sum(o != b for o, b in zip(outs, base_out))
        row = {"gamma": gamma,
               "tokens": n_tok,
               "wall_s": round(wall, 2),
               "tok_per_s": round(n_tok / wall, 2),
               "speedup_vs_plain": round((n_tok / wall)
                                         / (base_toks / base_wall), 2),
               "acceptance_rate": round(n_acc / max(n_tok - len(enc), 1), 3),
               "target_forwards_per_token": round(n_fwd / n_tok, 3),
               "greedy_parity_mismatches": mismatches}
        log(f"gamma={gamma}: {row['tok_per_s']} tok/s "
            f"(x{row['speedup_vs_plain']} vs plain), acceptance "
            f"{row['acceptance_rate']}, parity mismatches {mismatches}")
        rows.append(row)

    result = {
        "target": {"path": args.target, "dim": tcfg.dim,
                   "layers": tcfg.n_layers, "params_m": round(tn / 1e6, 1)},
        "draft": {"path": args.draft, "dim": dcfg.dim,
                  "layers": dcfg.n_layers, "params_m": round(dn / 1e6, 1)},
        "n_prompts": len(enc),
        "max_new": args.max_new,
        "plain_tok_per_s": round(base_toks / base_wall, 2),
        "sweep": rows,
        "note": "bs=1 greedy serving; speculative output is token-exact vs "
                "the target's own greedy (mismatches column). Prompts are "
                "serving-distribution PromptBuilder cand-path inputs.",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
