"""One-table v3-vs-v4 reconciliation -> docs/kernel_reconcile_r04.json.

VERDICT r3 weak #1: BUILD_NOTES claimed the v3->v4 switch took the B8
E2048/F8192 train step 74.8 -> 48.7 ms, yet BENCH_r03's B16 train was flat
vs r02 (+2.3%). The two numbers describe different configurations, and no
single artifact measured both. This script times v3 and v4 (K=1 and the
swept K) on the SAME process, SAME batches, at BOTH B8 and B16 WebQSP
shapes and the CWQ shape, fwd and train — so every public claim maps to
exactly one row.

Each (variant, K) gets jax.clear_caches() before building (kernel choice is
read from env at trace time).

Usage: python scripts/kernel_reconcile.py [--k_best 8]
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


def time_best(fn, n_iter=20, windows=3):
    import jax
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_config(variant: str, k: int, shapes):
    import jax
    import jax.numpy as jnp
    import optax

    os.environ["GNN_RAG_GATE_SCATTER"] = variant
    os.environ["GNN_RAG_V4_K"] = str(k)
    jax.clear_caches()

    from gnn_rag_tpu.config import ModelConfig
    from gnn_rag_tpu.models import ReaRev
    from gnn_rag_tpu.utils.synthetic import (random_graph_batch,
                                             random_rel_hidden)

    B, E, F, num_iter, num_ins, num_gnn = shapes
    rng = np.random.default_rng(0)
    batch = random_graph_batch(rng, batch_size=B, n_entities=E, n_facts=F,
                               num_relation=2048, word_dim=384, q_len=16,
                               build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, 2049, 12, 384)
    cfg = ModelConfig(entity_dim=50, num_iter=num_iter, num_ins=num_ins,
                      num_gnn=num_gnn, lm="sbert", linear_dropout=0.2)
    model = ReaRev(cfg=cfg, num_entity=100_000, num_relation=2048)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch,
                                 rel_h, rel_hinv, rel_mask)
    # device-resident inputs so rows time the step, not per-call h2d
    batch = jax.device_put(batch)
    rel_h, rel_hinv, rel_mask = jax.device_put(
        (jnp.asarray(rel_h), jnp.asarray(rel_hinv), jnp.asarray(rel_mask)))
    row = {"variant": variant, "K": k}

    fwd = jax.jit(lambda p, bt: model.apply(p, bt, rel_h, rel_hinv,
                                            rel_mask))
    jax.block_until_ready(fwd(params, batch))
    sec = time_best(lambda: fwd(params, batch))
    row["fwd_ms"] = round(1e3 * sec, 2)
    row["fwd_sgps"] = round(B / sec, 1)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rngk = jax.random.PRNGKey(1)

    def train_step(p, o, bt):
        def lf(pp):
            loss, _, _ = model.apply(pp, bt, rel_h, rel_hinv, rel_mask,
                                     training=True, rngs={"dropout": rngk})
            return loss
        loss, grads = jax.value_and_grad(lf)(p)
        upd, o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    ts = jax.jit(train_step)
    p2, _, _ = ts(params, opt_state, batch)
    jax.block_until_ready(p2)
    sec = time_best(lambda: ts(params, opt_state, batch)[2], n_iter=10)
    row["train_ms"] = round(1e3 * sec, 2)
    row["train_sgps"] = round(B / sec, 1)
    log(f"{shapes}: {row}")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k_best", type=int, default=8,
                    help="the winner of docs/kernel_k_sweep_r04.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of shape-set names; "
                         "results merge into the existing artifact "
                         "(tunnel-failure recovery)")
    args = ap.parse_args()

    shape_sets = {
        "webqsp_B8": (8, 2048, 8192, 3, 2, 3),
        "webqsp_B16": (16, 2048, 8192, 3, 2, 3),
        "cwq_B8": (8, 4096, 16384, 2, 3, 3),
    }
    if args.only:
        keep = set(args.only.split(","))
        shape_sets = {k: v for k, v in shape_sets.items() if k in keep}
    configs = [("v3", 1), ("v4", 1)]
    if args.k_best != 1:
        configs.append(("v4", args.k_best))

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "kernel_reconcile_r04.json")
    out = {"note": "single-process, same batches; every (variant,K) is "
                   "rebuilt after jax.clear_caches(). Reconciles BUILD_NOTES"
                   " 'v4 halved the B8 train step' vs the flat BENCH_r03 "
                   "B16 delta.", "tables": {}}
    if args.only and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for name, shapes in shape_sets.items():
        out["tables"][name] = [bench_config(v, k, shapes)
                               for v, k in configs]
        with open(path, "w") as f:      # persist per shape set: tunnel
            json.dump(out, f, indent=1)  # failures keep finished tables
            f.write("\n")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
