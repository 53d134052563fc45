"""SynthFB throughput decomposition -> docs/fb_profile_r05.json.

VERDICT r4 weak #6 / demand #5b: SynthFB trains at 69.9 sg/s vs ~102 on
SynthQSP (docs/training_fb_r03.json) and the ~45% gap was "diagnosed by
arithmetic, not a profile" for two rounds. This harness measures the
actual terms of the async epoch loop (train/trainer.py train_epoch) on
the real data:

  host_build_ms      make_batch wall time (batch assembly + kernel
                     layout packing), timed serially over N batches
  device_step_ms     the jitted train step, same-compile, blocked
  prefetch_stall_ms  fut.result() wait inside the live async loop —
                     >0 means the host can't keep up with the chip
  epoch_wall_s       the loop as shipped (async, device accumulators)

The lm_frozen=0 suspect (a trainable encoder puts the 6001-relation
text encode inside every train step, bert_encoder.py:80-87) is isolated
by running the harness twice: --lm_frozen 0 (the FB-scale config) vs
--lm_frozen 1 (frozen, rel features hoisted) — the device_step delta is
the encoder's train-time cost on real data.

Run: python scripts/fb_profile.py [--data data/synthfb] [--batches 40]
     python scripts/fb_profile.py --lm_frozen 1 --out docs/..._frozen.json
Reference match: the FB-scale config is gnn/parsing.py:51 fact_drop +
bert_encoder.py:80-87 trainable-encoder behavior.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synthfb")
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--lm_frozen", default="0")
    ap.add_argument("--full_epochs", type=int, default=0,
                    help="additionally run N REAL production epochs "
                         "(Trainer.train_epoch over the whole train split, "
                         "bucketed batching) and record per-epoch wall + "
                         "sg/s — the end-to-end number the r3 69.9 sg/s "
                         "baseline was measured as")
    ap.add_argument("--out", default="docs/fb_profile_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.cli import args_to_config, build_parser
    from gnn_rag_tpu.data.loader import load_dataset_dir
    from gnn_rag_tpu.train.trainer import Trainer

    argv = ["ReaRev", "--data_folder", args.data + "/", "--name",
            os.path.basename(args.data), "--checkpoint_dir", "/tmp/fbprof",
            "--experiment_name", "fbprof", "--entity_dim", "50",
            "--num_iter", "3", "--num_ins", "2", "--num_gnn", "3",
            "--lm", "sbert", "--relation_word_emb", "True",
            "--lm_frozen", args.lm_frozen, "--fact_drop", "0.1",
            "--batch_size", "8"]
    cfg = args_to_config(build_parser().parse_args(argv))
    data = load_dataset_dir(cfg)
    tr = Trainer(cfg, train_data=data["train"], valid_data=data["valid"],
                 test_data=data["test"],
                 num_entity=data["vocab"].num_entity,
                 num_kb_relation=data["num_kb_relation"])
    train = data["train"]
    B = cfg.train.batch_size
    rng_np = np.random.default_rng(0)
    train.reset_batches(is_sequential=False, rng=rng_np, bucket_size=B)
    N = min(args.batches, math.ceil(train.num_data / B))

    # ---- host build cost, serial
    builds = []
    batches = []
    for it in range(N):
        idx = train.batch_indices(it, B)
        t0 = time.perf_counter()
        b = train.make_batch(idx, batch_pad_to=B,
                             build_layout=tr.build_layout)
        builds.append(time.perf_counter() - t0)
        batches.append((idx, b))
    host_build_ms = 1e3 * float(np.median(builds))
    log(f"host make_batch: median {host_build_ms:.1f} ms "
        f"(p90 {1e3*np.percentile(builds, 90):.1f})")

    # ---- device step cost, same-compile blocking (first call compiles)
    valid_w = np.ones(B, np.float32)
    zero = jnp.zeros((), jnp.float32)
    params, opt_state = tr.params, tr.opt_state
    acc = (zero, zero, zero, zero)
    rng = jax.random.PRNGKey(0)
    steps = []
    for it, (idx, b) in enumerate(batches):
        rng, srng = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, acc = tr._train_step(params, opt_state, srng, b,
                                                valid_w, acc)
        jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
        if it > 0:          # it==0 pays the compile for its bucket
            steps.append(dt)
    device_step_ms = 1e3 * float(np.median(steps))
    log(f"device step: median {device_step_ms:.2f} ms "
        f"(sg/s at B{B}: {B/np.median(steps):.1f})")

    # ---- the live async loop: prefetch stalls + epoch wall
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)

    def build(it):
        idx = train.batch_indices(it, B)
        return idx, train.make_batch(idx, batch_pad_to=B,
                                     build_layout=tr.build_layout)

    stalls = []
    acc = (zero, zero, zero, zero)
    fut = pool.submit(build, 0)
    t_epoch = time.perf_counter()
    for it in range(N):
        t0 = time.perf_counter()
        idx, b = fut.result()
        stalls.append(time.perf_counter() - t0)
        if it + 1 < N:
            fut = pool.submit(build, it + 1)
        rng, srng = jax.random.split(rng)
        params, opt_state, acc = tr._train_step(params, opt_state, srng, b,
                                                valid_w, acc)
    jax.block_until_ready(acc)
    epoch_wall = time.perf_counter() - t_epoch
    stall_ms = 1e3 * float(np.median(stalls))
    log(f"async loop: {N*B/epoch_wall:.1f} sg/s, prefetch stall median "
        f"{stall_ms:.1f} ms (p90 {1e3*np.percentile(stalls, 90):.1f})")

    result = {
        "data": args.data, "batches": N, "batch_size": B,
        "lm_frozen": args.lm_frozen,
        "host_build_ms_median": round(host_build_ms, 2),
        "host_build_ms_p90": round(1e3 * float(np.percentile(builds, 90)), 2),
        "device_step_ms_median": round(device_step_ms, 2),
        "device_step_sgps": round(B / float(np.median(steps)), 1),
        "prefetch_stall_ms_median": round(stall_ms, 2),
        "prefetch_stall_ms_p90": round(
            1e3 * float(np.percentile(stalls, 90)), 2),
        "async_loop_sgps": round(N * B / epoch_wall, 1),
    }
    loop_sgps = N * B / epoch_wall
    dev_sgps = B / float(np.median(steps))
    if stall_ms > 0.1 * device_step_ms:
        verdict = ("host-bound (stall > 10% of step): speed up make_batch "
                   "or deepen prefetch")
    elif loop_sgps < 0.7 * dev_sgps:
        # near-zero stall but the loop runs well below the pure device-step
        # rate: the cost is per-iteration host work that the one-deep
        # prefetch can't hide (step DISPATCH + inline h2d of the batch),
        # not the compiled step itself
        verdict = (f"dispatch-bound: loop {loop_sgps:.0f} sg/s vs device "
                   f"step {dev_sgps:.0f} — per-batch host dispatch/h2d "
                   "dominates; stall ~0 so deeper prefetch won't help")
    else:
        verdict = "device-bound: the step itself is the cost"
    result["verdict"] = verdict

    if args.full_epochs > 0:
        # the production epoch (shuffle + bucketed batching + prefetch +
        # device accumulators), same loop the r3 69.9 sg/s was measured on
        import dataclasses as _dc
        tr.cfg = _dc.replace(
            tr.cfg, train=_dc.replace(tr.cfg.train, bucket_batches=True))
        walls = []
        for e in range(args.full_epochs):
            t0 = time.perf_counter()
            loss, h1, f1 = tr.train_epoch()
            walls.append(time.perf_counter() - t0)
            log(f"epoch {e}: {walls[-1]:.1f}s "
                f"({train.num_data/walls[-1]:.1f} sg/s) loss {loss:.3f}")
        warm = walls[1:] if len(walls) > 1 else walls
        result["full_epochs"] = {
            "n": args.full_epochs, "epoch_wall_s": [round(w, 1) for w in walls],
            "warm_epoch_s": round(float(np.median(warm)), 1),
            "warm_epoch_sgps": round(train.num_data /
                                     float(np.median(warm)), 1),
            "r3_baseline_sgps": 69.9}
    os.makedirs("docs", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
