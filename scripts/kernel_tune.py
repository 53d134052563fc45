"""Sweep the fused gate-scatter kernel: dtype x TILE_F x variant, on chip.

Each config runs in a subprocess (TILE_F is bound at import in
data.kernel_layout), times forward and forward+backward of the fused op at
WebQSP-like and CWQ-like shapes, and prints one JSON line; the parent
aggregates to docs/kernel_tune_r02.json.

Useful FLOPs (what the op semantically computes, reference reasongnn.py:61-116
per direction-step): projection 2*F*D*D + gate J*F*D + scatter-adds J*F*D.
Nominal FLOPs add the one-hot matmul inflation (2*Fp*TILE_E*J*D) and pad
lanes; wall-clock per op is the decision metric, useful-GFLOP/s the honest
efficiency number.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SHAPES = {
    # name: (B, E, F, D, J)
    "webqsp": (16, 2048, 8192, 50, 2),
    "cwq": (8, 4096, 16384, 50, 3),
}


def worker(shape: str, dtype: str, variant: str, with_bwd: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnn_rag_tpu.data.kernel_layout import (TILE_E, TILE_F,
                                                build_kernel_layout)
    from gnn_rag_tpu.ops import pallas_mp

    B, E, F, D, J = SHAPES[shape]
    rng = np.random.default_rng(0)
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = rng.integers(0, 200, (B, F)).astype(np.int32)
    mask = np.ones((B, F), np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=200)
    from gnn_rag_tpu.data.kernel_layout import DirectionLayout
    fwd = DirectionLayout(**jax.device_put(
        jax.tree.map(jnp.asarray, kl.fwd._asdict())))
    kl_dev = kl._replace(
        fwd=fwd, inv=DirectionLayout(**jax.device_put(
            jax.tree.map(jnp.asarray, kl.inv._asdict()))))
    Fp = fwd.scatter.shape[1]
    Fp_i = kl_dev.inv.scatter.shape[1]

    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    k = jax.random.PRNGKey(0)
    fact_rel = jax.random.normal(k, (B, Fp, D), cdt)
    fact_rel_i = jax.random.normal(k, (B, Fp_i, D), cdt)
    w = jax.random.normal(k, (D, D), cdt) * 0.1
    bias = jnp.zeros((D,), cdt)
    ins = jax.random.normal(k, (B, J, D), cdt)
    prior = jax.nn.softmax(jax.random.normal(k, (B, Fp)), axis=-1)
    prior_i = jax.nn.softmax(jax.random.normal(k, (B, Fp_i)), axis=-1)

    def call(fr, pr):
        if variant == "v1":
            return pallas_mp.fused_gate_scatter(
                fr, w, bias, ins, pr, fwd.scatter, fwd.chunk_tiles, E, True)
        if variant == "v2":
            return pallas_mp.fused_gate_scatter_v2(
                fr, w, bias, ins, pr, fwd.scatter, fwd.chunk_starts,
                fwd.chunk_tiles, E, True)
        if variant == "v4":
            # BOTH directions in one launch (the model's default path);
            # directly comparable to 2x a single-direction v3 row
            out_f, out_i = pallas_mp.gate_scatter_both(
                fr, fact_rel_i, ins, pr, prior_i, kl_dev, E)
            return out_f + out_i
        # v3: already-projected values (table projection happens in XLA
        # outside the op; here fr stands in for the projected gather)
        return pallas_mp.gated_scatter_v3(
            fr, ins, pr, fwd.scatter, fwd.chunk_tiles, E, True)

    op = jax.jit(call)

    def loss(fr, pr):
        o = call(fr, pr)
        return jnp.sum(o * o)

    gop = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def best_ms(fn, args, n_iter=30, windows=4):
        fn(*args)  # compile
        jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            out = None
            for _ in range(n_iter):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return 1e3 * best

    fwd_ms = best_ms(op, (fact_rel, prior))
    useful_gflop = (2 * B * F * D * D + 2 * J * B * F * D * 2) / 1e9
    row = {
        "shape": shape, "dtype": dtype, "variant": variant,
        "tile_f": TILE_F, "tile_e": TILE_E, "Fp": int(Fp),
        "fwd_ms": round(fwd_ms, 3),
        "useful_gflop": round(useful_gflop, 2),
        "fwd_useful_tflops": round(useful_gflop / fwd_ms, 2),
    }
    if with_bwd:
        row["fwd_bwd_ms"] = round(best_ms(gop, (fact_rel, prior)), 3)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--shape", default="webqsp")
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--variant", default="v2")
    ap.add_argument("--no_bwd", action="store_true")
    ap.add_argument("--tile_fs", default="128,256,512")
    ap.add_argument("--shapes", default="webqsp,cwq")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--variants", default="v2")
    ap.add_argument("--out", default="docs/kernel_tune_r02.json")
    args = ap.parse_args()

    if args.worker:
        print(json.dumps(worker(args.shape, args.dtype, args.variant,
                                with_bwd=not args.no_bwd)),
              flush=True)
        return

    rows = []
    for shape in args.shapes.split(","):
        for tf in args.tile_fs.split(","):
            for dtype in args.dtypes.split(","):
                for variant in args.variants.split(","):
                    repo = os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))
                    # append, don't replace: PYTHONPATH also carries the TPU
                    # platform plugin site dir
                    pp = os.environ.get("PYTHONPATH", "")
                    env = dict(os.environ, GNN_RAG_TILE_F=tf,
                               PYTHONPATH=f"{repo}:{pp}" if pp else repo)
                    cmd = [sys.executable, __file__, "--worker",
                           "--shape", shape, "--dtype", dtype,
                           "--variant", variant]
                    if args.no_bwd:
                        cmd.append("--no_bwd")
                    print(f"== {shape} tile_f={tf} {dtype} {variant}",
                          file=sys.stderr, flush=True)
                    try:
                        out = subprocess.run(
                            cmd, env=env, capture_output=True, text=True,
                            timeout=900)
                        line = out.stdout.strip().splitlines()[-1]
                        row = json.loads(line)
                    except Exception as exc:
                        row = {"shape": shape, "tile_f": int(tf),
                               "dtype": dtype, "variant": variant,
                               "error": str(exc)[-400:]}
                        if 'out' in dir() and out.stderr:
                            row["stderr_tail"] = out.stderr[-400:]
                    print(json.dumps(row), file=sys.stderr, flush=True)
                    rows.append(row)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out} ({len(rows)} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
