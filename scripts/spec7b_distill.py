"""Trained-pair speculative decoding at 7B -> docs/llm7b_r05.json.

VERDICT r4 demand #4: llm7b_r04.json's speculative section measured a
RANDOM draft (acceptance 0.0, slower than plain decode) and projected
tok/s from toy-scale acceptance — "code without numbers". This study
makes the row real with the route the verdict itself suggested:
**distill the draft from the target's greedy outputs**.

No 7B weights exist in this zero-egress environment, so the target is
the exact LLaMA2-7B architecture (llama.py:15-36 reference serving
model) with seeded random bf16 weights — the same target
scripts/llm7b_study.py measures. Its greedy continuations are a
deterministic function the draft can learn; speculative decoding only
ever needs the draft to agree with the target ON the target's own
greedy path (off-path tokens are rejected and replaced by the target's
argmax, so exactness never depends on the draft).

Phases (separate processes so the 12.55 GB target is fully released
between generation and draft training on the one 16 GB chip):

  gen      7B target greedy paths from seeded random prompts (bs=8
           batched decode) -> /tmp/spec7b_paths.npz (train + heldout)
  train    distill a tiny draft (SFTTrainer, loss masked to the
           generated span) -> /tmp/spec7b_draft.msgpack; reports
           teacher-forced on-path argmax agreement on HELD-OUT paths
           (the acceptance-probability proxy) as an early gate
  measure  reload the target (same seed => identical weights), run
           SpeculativeDecoder on held-out prompts: measured acceptance,
           tok/s, and EXACT greedy parity vs Decoder.greedy of the
           target, next to a same-process plain bf16 bs=1 baseline
           -> docs/llm7b_r05.json

Success bars (VERDICT r4 #4): acceptance > 0.6, parity true at 7B,
tok/s >= 1.5x the plain bf16 bs=1 baseline.

Usage:
  python scripts/spec7b_distill.py --phase gen
  python scripts/spec7b_distill.py --phase train
  python scripts/spec7b_distill.py --phase measure
  python scripts/spec7b_distill.py --phase all --tiny   # CPU/smoke pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATHS_NPZ = "/tmp/spec7b_paths.npz"
DRAFT_MSGPACK = "/tmp/spec7b_draft.msgpack"
OUT_JSON = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "llm7b_r05.json")

PROMPT_LEN = 32
GEN_LEN = 96            # on-path tokens per training sequence
N_TRAIN = 1024
N_HELDOUT = 64
TARGET_SEED = 1         # must match llm7b_study.random_device_params seed


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def target_config(tiny: bool):
    from gnn_rag_tpu.llm_tpu.model import LlamaConfig
    if tiny:
        return LlamaConfig(dim=256, n_layers=4, n_heads=4, n_kv_heads=4,
                           intermediate=688, max_seq_len=512)
    return LlamaConfig(max_seq_len=512)   # LLaMA2-7B defaults


def draft_config(tiny: bool):
    from gnn_rag_tpu.llm_tpu.model import LlamaConfig
    if tiny:
        return LlamaConfig(dim=128, n_layers=2, n_heads=2, n_kv_heads=2,
                           intermediate=344, max_seq_len=512,
                           tie_embeddings=True)
    # tie_embeddings: the target's greedy paths collapse onto a small
    # attractor set that the draft mostly continues by induction (copy
    # the token that followed this token earlier in context) — tying
    # makes that circuit learnable fast (see LlamaConfig.tie_embeddings
    # note and the r4 reader diagnosis in BUILD_NOTES).
    return LlamaConfig(dim=512, n_layers=4, n_heads=8, n_kv_heads=8,
                       intermediate=1408, max_seq_len=512,
                       tie_embeddings=True)


def make_prompts(n: int, vocab: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, vocab, size=(n, PROMPT_LEN)).astype(np.int32)


# ---------------------------------------------------------------- phases
def phase_gen(tiny: bool):
    import jax
    from gnn_rag_tpu.llm_tpu.generate import Decoder
    from gnn_rag_tpu.llm_tpu.model import LlamaLM
    from scripts.llm7b_study import random_device_params

    cfg = target_config(tiny)
    model = LlamaLM(cfg)
    params, n_params, n_bytes = random_device_params(model, seed=TARGET_SEED)
    log(f"target: {n_params/1e6:.0f}M params, {n_bytes/2**30:.2f} GB")
    dec = Decoder(model, params, max_len=PROMPT_LEN + GEN_LEN)

    out = {}
    for split, n, seed in (("train", N_TRAIN, 100),
                           ("heldout", N_HELDOUT, 200)):
        prompts = make_prompts(n, cfg.vocab_size, seed)
        seqs = np.zeros((n, PROMPT_LEN + GEN_LEN), np.int32)
        bs = 8
        t0 = time.time()
        for i in range(0, n, bs):
            grp = prompts[i:i + bs]
            gen = dec.greedy_batch([p.tolist() for p in grp],
                                   max_new_tokens=GEN_LEN)
            for j, g in enumerate(gen):
                seqs[i + j, :PROMPT_LEN] = grp[j]
                seqs[i + j, PROMPT_LEN:PROMPT_LEN + len(g)] = g[:GEN_LEN]
            if i % (bs * 16) == 0:
                log(f"gen {split} {i}/{n} "
                    f"({(i+bs)*GEN_LEN/(time.time()-t0):.0f} tok/s)")
        out[split] = seqs
        log(f"gen {split}: {n} paths in {time.time()-t0:.0f}s")

    np.savez(PATHS_NPZ, **out)
    log("wrote", PATHS_NPZ)


def phase_train(tiny: bool):
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from gnn_rag_tpu.llm_tpu.sft import SFTConfig, SFTTrainer

    data = np.load(PATHS_NPZ)
    train, heldout = data["train"], data["heldout"]
    L = train.shape[1]
    mask = np.zeros_like(train, np.float32)
    mask[:, PROMPT_LEN:] = 1.0      # distill ONLY the generated span
    # (prompt tokens are iid uniform noise — unlearnable, and training on
    # them just burns capacity)

    dcfg = draft_config(tiny)
    steps = 200 if tiny else 4000
    tcfg = SFTConfig(output_dir="/tmp/spec7b_draft_ckpt",
                     learning_rate=3e-4, warmup_steps=100,
                     total_steps=steps, batch_size=32, max_seq_len=L,
                     save_every=10 ** 9, seed=0)
    tr = SFTTrainer(dcfg, tcfg)
    t0 = time.time()
    tr.train(train, mask, log_every=100, resume=False)
    wall = time.time() - t0

    # teacher-forced on-path argmax agreement on held-out paths: the
    # per-token acceptance-probability proxy (speculation commits the
    # draft's argmax only where it equals the target's, ON the target's
    # greedy path — which is exactly what these positions are)
    @jax.jit
    def agree(params, tokens):
        logits, _ = tr.model.apply(params, tokens[:, :-1])
        pred = jnp.argmax(logits, axis=-1)
        ok = (pred == tokens[:, 1:]).astype(jnp.float32)
        m = jnp.zeros_like(ok).at[:, PROMPT_LEN - 1:].set(1.0)
        return jnp.sum(ok * m) / jnp.sum(m)

    accs = [float(agree(tr.params, jnp.asarray(heldout[i:i + 32])))
            for i in range(0, len(heldout), 32)]
    acc = float(np.mean(accs))
    log(f"draft trained {steps} steps in {wall:.0f}s; "
        f"held-out on-path argmax agreement = {acc:.3f}")

    with open(DRAFT_MSGPACK, "wb") as f:
        f.write(serialization.to_bytes(
            jax.device_get(jax.tree.map(lambda x: x, tr.params))))
    meta = {"draft_config": {k: getattr(dcfg, k) for k in
                             ("dim", "n_layers", "n_heads", "n_kv_heads",
                              "intermediate", "vocab_size",
                              "tie_embeddings")},
            "steps": steps, "train_wall_s": round(wall, 1),
            "heldout_onpath_agreement": round(acc, 4)}
    with open(DRAFT_MSGPACK + ".json", "w") as f:
        json.dump(meta, f, indent=1)
        f.write("\n")
    log("wrote", DRAFT_MSGPACK)
    if acc < 0.6:
        log("WARNING: agreement < 0.6 — acceptance bar is at risk; "
            "consider more steps or a bigger draft before measuring")


def phase_measure(tiny: bool):
    import jax
    from flax import serialization
    from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder
    from gnn_rag_tpu.llm_tpu.model import LlamaLM
    from scripts.llm7b_study import random_device_params

    cfg = target_config(tiny)
    model = LlamaLM(cfg)
    params, n_params, n_bytes = random_device_params(model, seed=TARGET_SEED)

    dcfg = draft_config(tiny)
    draft = LlamaLM(dcfg)
    shapes = jax.eval_shape(draft.init, jax.random.PRNGKey(0),
                            np.zeros((1, 8), np.int32))
    with open(DRAFT_MSGPACK, "rb") as f:
        dparams = serialization.from_bytes(shapes, f.read())
    dparams = jax.tree.map(
        lambda s, x: jax.device_put(np.asarray(x)).astype(s.dtype),
        shapes, dparams)
    dmeta = json.load(open(DRAFT_MSGPACK + ".json"))
    dn = sum(int(np.prod(s.shape))
             for s in jax.tree.leaves(shapes))

    max_new = 256
    prompts = make_prompts(16, cfg.vocab_size, 300)   # measurement split

    # ---- plain bf16 bs=1 baseline, same process & prompts
    dec = Decoder(model, params, max_len=PROMPT_LEN + max_new + 1)
    dec.greedy(prompts[0].tolist(), max_new_tokens=max_new)   # compile
    t0 = time.time()
    plain_outs = [dec.greedy(p.tolist(), max_new_tokens=max_new)
                  for p in prompts]
    plain_s = time.time() - t0
    plain_tps = len(prompts) * max_new / plain_s
    log(f"plain bf16 bs=1: {plain_tps:.1f} tok/s")

    result = {
        "target": {"params_m": round(n_params / 1e6, 1),
                   "bytes_gb": round(n_bytes / 2**30, 2),
                   "note": "exact LLaMA2-7B architecture, seeded random "
                           "bf16 weights (no 7B checkpoint exists in the "
                           "zero-egress image); kernels/memory/throughput "
                           "identical to a real checkpoint"},
        "draft": dict(dmeta, params_m=round(dn / 1e6, 1)),
        "plain_bf16_bs1_tokens_per_s": round(plain_tps, 1),
        "speculative": {},
    }

    for gamma in (4, 8):
        spec = SpeculativeDecoder(model, params, draft, dparams,
                                  max_len=PROMPT_LEN + max_new + gamma + 2,
                                  gamma=gamma)
        spec.greedy(prompts[0].tolist(), max_new_tokens=max_new)  # compile
        tot_tok = tot_fwd = tot_acc = 0
        parity = True
        t0 = time.time()
        outs = []
        for p in prompts:
            outs.append(spec.greedy(p.tolist(), max_new_tokens=max_new))
            st = spec.last_stats
            tot_tok += st["tokens"]
            tot_fwd += st["target_forwards"]
            tot_acc += st["draft_accepted"]
        spec_s = time.time() - t0
        parity = all(o == g for o, g in zip(outs, plain_outs))
        alpha = tot_acc / max(tot_fwd - len(prompts), 1) / gamma
        row = {
            "tokens_per_s": round(tot_tok / spec_s, 1),
            "speedup_vs_plain": round(tot_tok / spec_s / plain_tps, 2),
            "measured_acceptance": round(alpha, 3),
            "tokens_per_target_forward": round(tot_tok / tot_fwd, 2),
            "exact_greedy_parity": bool(parity),
            "n_prompts": len(prompts), "max_new": max_new,
        }
        result["speculative"][f"gamma{gamma}"] = row
        log(f"gamma={gamma}: {row}")

    out = "/tmp/spec7b_tiny.json" if tiny else OUT_JSON
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "train", "measure", "all"])
    ap.add_argument("--tiny", action="store_true",
                    help="small target+draft smoke pipeline")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; the "
                         "JAX_PLATFORMS env var is overridden by this "
                         "image's sitecustomize)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.phase == "all":
        # subprocesses so each phase starts with an empty device
        for ph in ("gen", "train", "measure"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--phase", ph] + (["--tiny"] if args.tiny else []) \
                  + (["--cpu"] if args.cpu else [])
            log(">>>", " ".join(cmd))
            subprocess.run(cmd, check=True)
        return
    {"gen": phase_gen, "train": phase_train,
     "measure": phase_measure}[args.phase](args.tiny)


if __name__ == "__main__":
    main()
