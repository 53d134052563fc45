"""Decompose the WebQSP-B16 train step: where is the non-kernel floor?

VERDICT r4 demand #1: BENCH train throughput sits below the 200 sg/s bar
even with the K=8 fused kernels (docs/kernel_reconcile_r04.json: 169.4
sg/s single-process).  The fused scatter op itself is ~9 x 3.7 ms = 33 ms
of a ~95 ms step, so the remaining floor is elsewhere.  This script
measures it directly instead of guessing:

1. train-step wall time vs GNN depth (num_iter x num_gnn in {1x1, 2x3,
   3x3}): a linear fit gives ms-per-GNN-layer (the kernel+glue share) and
   the depth-independent intercept (encoder + instruction decoder +
   rel-text encode + scoring + loss + Adam).
2. train-step wall time vs relation-table rows R in {64, 2048}: the delta
   isolates the per-step rel-text self-attention encode
   (models/rearev.py:279-282 — [R+1, Lr, 384] projected + attention-pooled
   every step because question_emb trains), a batch-size-independent cost.
3. fwd-only rows for the same grid, separating fwd floor from bwd floor.

Output: docs/kernel_floor_r05.json + a human verdict line.

Reference match: reasongnn.py:61-116 (the torch.sparse op this replaces);
the floor components have no reference counterpart to beat — they are the
price of the full ReaRev step (base_model + instruction decode + scoring).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.models.rearev import ReaRev
from gnn_rag_tpu.utils.synthetic import random_graph_batch, random_rel_hidden


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, n_iter=10, windows=3):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def measure(B, E, F, D, num_iter, num_gnn, R, rng, num_entity=100_000):
    batch = random_graph_batch(rng, batch_size=B, n_entities=E, n_facts=F,
                               num_relation=R, word_dim=384, q_len=16,
                               build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, R + 1, 12, 384)
    cfg = ModelConfig(entity_dim=D, num_iter=num_iter, num_ins=2,
                      num_gnn=num_gnn, lm="sbert", linear_dropout=0.2)
    model = ReaRev(cfg=cfg, num_entity=num_entity, num_relation=R)
    batch = jax.device_put(batch)
    rel_h = jax.device_put(jnp.asarray(rel_h))
    rel_hinv = jax.device_put(jnp.asarray(rel_hinv))
    rel_mask = jax.device_put(jnp.asarray(rel_mask))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch,
                                 rel_h, rel_hinv, rel_mask)

    mfwd = jax.jit(lambda p, bt: model.apply(p, bt, rel_h, rel_hinv,
                                             rel_mask))
    jax.block_until_ready(mfwd(params, batch))
    fwd_ms = 1e3 * time_best(lambda: mfwd(params, batch))

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
    train_ms = 1e3 * time_best(lambda: ts(params, opt_state, batch)[2])
    row = {"num_iter": num_iter, "num_gnn": num_gnn, "gnn_layers":
           num_iter * num_gnn, "R": R, "num_entity": num_entity,
           "fwd_ms": round(fwd_ms, 2),
           "train_ms": round(train_ms, 2),
           "train_sgps": round(B / (train_ms / 1e3), 1)}
    log(row)
    return row


def main():
    B, E, F, D = 16, 2048, 8192, 50
    rng = np.random.default_rng(0)
    rows = []
    # depth axis at reference R=2048
    for ni, ng in ((1, 1), (2, 3), (3, 3)):
        rows.append(measure(B, E, F, D, ni, ng, 2048, rng))
    # relation-table axis at reference depth
    rows.append(measure(B, E, F, D, 3, 3, 64, rng))
    # entity-vocab axis (Adam moments + embed gather/scatter over the
    # global table; SynthFB trains with a 1M-entity vocab)
    rows.append(measure(B, E, F, D, 3, 3, 2048, rng, num_entity=1_000_000))

    # linear fit over the depth axis: train_ms = a + b * layers
    depth = [r for r in rows
             if r["R"] == 2048 and r["num_entity"] == 100_000]
    xs = np.array([r["gnn_layers"] for r in depth], dtype=np.float64)
    ys = np.array([r["train_ms"] for r in depth], dtype=np.float64)
    b, a = np.polyfit(xs, ys, 1)
    r2048 = next(r for r in rows if r["gnn_layers"] == 9 and r["R"] == 2048
                 and r["num_entity"] == 100_000)
    r64 = next(r for r in rows if r["gnn_layers"] == 9 and r["R"] == 64)
    r1m = next(r for r in rows if r["num_entity"] == 1_000_000)
    rel_encode_ms = r2048["train_ms"] - r64["train_ms"]
    ent_table_ms = r1m["train_ms"] - r2048["train_ms"]
    verdict = {
        "shapes": {"B": B, "E": E, "F": F, "D": D},
        "rows": rows,
        "fit": {"ms_per_gnn_layer": round(float(b), 2),
                "depth_independent_floor_ms": round(float(a), 2)},
        "rel_text_encode_ms_at_R2048": round(float(rel_encode_ms), 2),
        "entity_table_1M_vs_100k_ms": round(float(ent_table_ms), 2),
        "note": "train_ms ~= floor + layers * ms_per_layer; the floor is "
                "question encoding + instruction decoder + rel-text encode "
                "+ entity scoring/loss + Adam. rel_text_encode_ms is the "
                "R=2048 vs R=64 train-step delta (the [R+1,12,384] "
                "self-attention encode recomputed per step because its "
                "projection trains).",
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/kernel_floor_r05.json", "w") as f:
        json.dump(verdict, f, indent=1)
        f.write("\n")
    print(json.dumps(verdict, indent=1))


if __name__ == "__main__":
    main()
