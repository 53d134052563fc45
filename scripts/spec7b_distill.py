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
# v1 of this study used N_TRAIN=1024 and the draft MEMORIZED them (train
# loss 5e-4, held-out on-path agreement 0.205). Diagnostic on the v1 paths:
# 94.8% of generated positions are predicted by "copy the successor of
# this token's previous occurrence in the current context" (the induction
# rule) — the target's greedy paths fall into per-prompt attractor cycles,
# so the GENERALIZING solution is an induction circuit, which the draft
# only learns when memorization is too expensive. 6x the data makes
# induction the cheaper fit (same mechanism as the r4 reader diagnosis in
# BUILD_NOTES).
N_TRAIN = 6144
N_HELDOUT = 64
GEN_BS = 16             # batched greedy decode width for path generation
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
        bs = GEN_BS
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


def synth_induction(rng, n, L, vocab, tok_pool, tok_probs):
    """Synthetic attractor-cycle examples: random prompt, short random
    preamble, then a cycle of period 1..32 repeated to the end. Loss starts
    only after one full period is in context, where the induction rule
    (copy the successor of this token's previous occurrence) predicts
    every position. The v2 diagnostic showed 94.8% of the target's real
    greedy-path positions follow this rule, but a draft trained on the
    real paths alone part-memorizes them instead (they are finite; these
    are not — every example is fresh, so only the circuit fits). Cycle
    tokens are drawn from the real paths' empirical unigram so the same
    embeddings carry both data sources."""
    seqs = np.zeros((n, L), np.int32)
    mask = np.zeros((n, L), np.float32)
    body_len = L - PROMPT_LEN
    for i in range(n):
        p = int(rng.integers(1, 33))
        cyc = rng.choice(tok_pool, size=p, p=tok_probs)
        pre = int(rng.integers(0, 17))
        body = np.concatenate([rng.choice(tok_pool, size=pre, p=tok_probs),
                               np.tile(cyc, (body_len // p) + 2)])[:body_len]
        seqs[i, :PROMPT_LEN] = rng.integers(1, vocab, size=PROMPT_LEN)
        seqs[i, PROMPT_LEN:] = body
        mask[i, PROMPT_LEN + pre + p:] = 1.0
    return seqs, mask


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

    # mix in synthetic cycle-structure examples (see synth_induction)
    rng = np.random.default_rng(7)
    toks, counts = np.unique(train[:, PROMPT_LEN:], return_counts=True)
    n_synth = 256 if tiny else 8192
    vocab = int(max(toks.max() + 1, train.max() + 1))
    s_seqs, s_mask = synth_induction(rng, n_synth, L, vocab,
                                     toks, counts / counts.sum())
    train = np.concatenate([train, s_seqs])
    mask = np.concatenate([mask, s_mask])
    log(f"train set: {len(data['train'])} distilled paths + "
        f"{n_synth} synthetic cycle examples")

    dcfg = draft_config(tiny)
    steps = 200 if tiny else 8000
    eval_every = 100 if tiny else 500
    tcfg = SFTConfig(output_dir="/tmp/spec7b_draft_ckpt",
                     learning_rate=3e-4, warmup_steps=100,
                     weight_decay=0.05,
                     total_steps=steps, batch_size=32, max_seq_len=L,
                     save_every=10 ** 9, seed=0)
    tr = SFTTrainer(dcfg, tcfg)

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

    def heldout_agreement(params):
        accs = [float(agree(params, jnp.asarray(heldout[i:i + 32])))
                for i in range(0, len(heldout), 32)]
        return float(np.mean(accs))

    # segmented training with held-out-agreement selection: the quantity
    # speculation pays for is AGREEMENT, not train loss — a draft that
    # keeps grinding train loss after the induction circuit forms only
    # re-memorizes (the v1 failure). Keep the best-agreement params.
    t0 = time.time()
    best_acc, best_params, curve = -1.0, tr.params, []
    for seg_end in range(eval_every, steps + 1, eval_every):
        tr.train(train, mask, steps=seg_end, log_every=eval_every,
                 resume=False)
        a = heldout_agreement(tr.params)
        curve.append({"step": seg_end, "heldout_agreement": round(a, 4)})
        log(f"  step {seg_end}: held-out agreement {a:.3f}")
        if a > best_acc:
            # host snapshot: the train step donates its params buffers, so
            # an on-device alias would be deleted by the next segment
            best_acc, best_params = a, jax.device_get(tr.params)
    wall = time.time() - t0
    tr.params = best_params
    acc = best_acc
    log(f"draft trained {steps} steps in {wall:.0f}s; "
        f"best held-out on-path argmax agreement = {acc:.3f}")

    with open(DRAFT_MSGPACK, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tr.params)))
    meta = {"draft_config": {k: getattr(dcfg, k) for k in
                             ("dim", "n_layers", "n_heads", "n_kv_heads",
                              "intermediate", "vocab_size",
                              "tie_embeddings")},
            "steps": steps, "train_wall_s": round(wall, 1),
            "n_distilled_paths": int(data["train"].shape[0]),
            "n_synth_cycle_examples": int(n_synth),
            "agreement_curve": curve,
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
