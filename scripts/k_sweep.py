"""k_per_cell sweep on the real chip -> docs/kernel_k_sweep_r05.json (--out).

Times the v4 fused gate-scatter op (fwd and fwd+bwd) and the full ReaRev
train step at bench shapes for GNN_RAG_V4_K in {1, 2, 4, 8}. K>1 processes
K chunks per grid iteration, amortising the ~1.1us per-iteration fixed cost
(BUILD_NOTES "kernel roofline") that dominates the op at D=50.

jax caches jitted computations independent of env vars, so each K gets
jax.clear_caches() before building its functions.

Usage: python scripts/k_sweep.py [--ks 1,2,4,8] [--flip-default]
With --flip-default, rewrites ops/pallas_mp.py's default K cap to the
winner (the sweep artifact records the evidence).
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


def bench_k(K: int, shapes):
    import jax
    import jax.numpy as jnp
    import optax

    os.environ["GNN_RAG_V4_K"] = str(K)
    jax.clear_caches()

    from gnn_rag_tpu.config import ModelConfig
    from gnn_rag_tpu.models import ReaRev
    from gnn_rag_tpu.ops import pallas_mp as pm
    from gnn_rag_tpu.utils.synthetic import (random_graph_batch,
                                             random_rel_hidden)

    B, E, F, D, J = shapes
    rng = np.random.default_rng(0)
    batch = random_graph_batch(rng, batch_size=B, n_entities=E, n_facts=F,
                               num_relation=2048, word_dim=384, q_len=16,
                               build_layout=True)
    row = {"K": K, "effective_K": None}

    # ---- op level: v4 dual-direction fwd and fwd+bwd
    layout = batch.layout
    NC = layout.fwd.chunk_tiles.shape[1]
    row["effective_K"] = pm._pick_k(NC)
    Fp = layout.fwd.scatter.shape[1]
    vals_f = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    vals_i = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    pr_f = jnp.asarray((rng.random((B, Fp))
                        * (np.asarray(layout.fwd.scatter) >= 0)
                        ).astype(np.float32))
    pr_i = jnp.asarray((rng.random((B, Fp))
                        * (np.asarray(layout.inv.scatter) >= 0)
                        ).astype(np.float32))
    sc_f = jnp.asarray(layout.fwd.scatter)
    sc_i = jnp.asarray(layout.inv.scatter)
    ct2 = jnp.stack([jnp.asarray(layout.fwd.chunk_tiles),
                     jnp.asarray(layout.inv.chunk_tiles)], axis=1)

    fwd = jax.jit(lambda a, b, c, d, e: pm.gated_scatter_v4(
        a, b, c, d, e, sc_f, sc_i, ct2, E, True))
    jax.block_until_ready(fwd(vals_f, vals_i, ins, pr_f, pr_i))
    row["op_fwd_ms"] = round(1e3 * time_best(
        lambda: fwd(vals_f, vals_i, ins, pr_f, pr_i)), 3)

    def loss_fn(vf, vi, ii, pf, pi):
        of, oi = pm.gated_scatter_v4(vf, vi, ii, pf, pi, sc_f, sc_i, ct2,
                                     E, True)
        return jnp.sum(of * of) + jnp.sum(oi * oi)

    grad = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    jax.block_until_ready(grad(vals_f, vals_i, ins, pr_f, pr_i))
    row["op_fwd_bwd_ms"] = round(1e3 * time_best(
        lambda: grad(vals_f, vals_i, ins, pr_f, pr_i)), 3)

    # ---- model level: ReaRev fwd + train step
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, 2049, 12, 384)
    cfg = ModelConfig(entity_dim=D, num_iter=3, num_ins=2, num_gnn=3,
                      lm="sbert", linear_dropout=0.2)
    model = ReaRev(cfg=cfg, num_entity=100_000, num_relation=2048)
    # device-resident inputs: without this the model-level rows time the
    # per-call host->device transfer of the batch + rel tables (~40MB) on
    # top of the step (the r04 sweep's model_fwd_ms columns carried it;
    # op-level and train columns order K identically either way)
    batch = jax.device_put(batch)
    rel_h = jax.device_put(jnp.asarray(rel_h))
    rel_hinv = jax.device_put(jnp.asarray(rel_hinv))
    rel_mask = jax.device_put(jnp.asarray(rel_mask))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch,
                                 rel_h, rel_hinv, rel_mask)
    mfwd = jax.jit(lambda p, bt: model.apply(p, bt, rel_h, rel_hinv,
                                             rel_mask))
    jax.block_until_ready(mfwd(params, batch))
    sec = time_best(lambda: mfwd(params, batch))
    row["model_fwd_ms"] = round(1e3 * sec, 2)
    row["model_fwd_sgps"] = round(B / sec, 1)

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
    p2, o2, _ = ts(params, opt_state, batch)
    jax.block_until_ready(p2)
    sec = time_best(lambda: ts(params, opt_state, batch)[2], n_iter=10)
    row["train_ms"] = round(1e3 * sec, 2)
    row["train_sgps"] = round(B / sec, 1)
    log(f"K={K} (effective {row['effective_K']}): {row}")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--shapes", default="8,2048,8192,50,2",
                    help="B,E,F,D,J; semicolon-separated for multiple sets")
    ap.add_argument("--out", default="kernel_k_sweep_r05.json",
                    help="artifact filename under docs/")
    ap.add_argument("--flip-default", action="store_true")
    args = ap.parse_args()
    shape_sets = [tuple(int(x) for x in s.split(","))
                  for s in args.shapes.split(";")]
    sweeps = []
    for shapes in shape_sets:
        rows = [bench_k(int(k), shapes) for k in args.ks.split(",")]
        sweeps.append({"shapes": {"B": shapes[0], "E": shapes[1],
                                  "F": shapes[2], "D": shapes[3],
                                  "J": shapes[4]},
                       "rows": rows,
                       "winner_K": min(rows,
                                       key=lambda r: r["train_ms"])["K"]})
    out = sweeps[0] if len(sweeps) == 1 else {"sweeps": sweeps}
    # overall winner = best train_ms summed across shape sets, per K
    ks = [r["K"] for r in sweeps[0]["rows"]]
    totals = {k: sum(s["rows"][i]["train_ms"] for s in sweeps)
              for i, k in enumerate(ks)}
    best = {"K": min(totals, key=totals.get)}
    out["winner_K"] = best["K"]
    path = os.path.join(os.path.dirname(__file__), "..", "docs", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))
    if args.flip_default and best["K"] != 1:
        src_path = os.path.join(os.path.dirname(__file__), "..",
                                "gnn_rag_tpu", "ops", "pallas_mp.py")
        src = open(src_path).read()
        old = 'cap = int(os.environ.get("GNN_RAG_V4_K", "1"))'
        new = f'cap = int(os.environ.get("GNN_RAG_V4_K", "{best["K"]}"))'
        assert old in src, "default line moved; flip manually"
        open(src_path, "w").write(src.replace(old, new))
        log(f"flipped default K cap to {best['K']} in ops/pallas_mp.py")


if __name__ == "__main__":
    main()
