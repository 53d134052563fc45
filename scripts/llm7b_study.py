"""LLaMA2-7B-config on-chip study -> docs/llm7b_r03.json.

VERDICT r2 gap #2: the reference reads with LLaMA2-7B
(llm/src/llms/language_models/llama.py:15-36) and finetunes it
(joint_training/joint_finetuning.py:84-185); this repo's LLM evidence topped
out at dim-1024/4-layer. No 7B weights exist in this environment (zero
egress), so this study builds the EXACT 7B architecture (dim 4096 / 32L /
32H / intermediate 11008, the LlamaConfig defaults) with random bf16
weights — memory layout, kernels, and throughput are identical to a real
checkpoint; only the sampled text differs.

Measures on the one 16GB v5e chip:
* bf16 param residency (13.48 GB) + peak HBM,
* prefill latency at 512/1024/2048 context (flash-attention path),
* greedy decode tokens/s with the kv-cache Decoder,
* where 7B SFT needs the mesh: analytic per-device memory over
  llm_tpu/sharding.py dp x tp specs (params + Adam m/v + grads).
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

from gnn_rag_tpu.llm_tpu.generate import Decoder
from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def hbm_gb():
    st = jax.local_devices()[0].memory_stats() or {}
    return round(st.get("bytes_in_use", 0) / 2**30, 2), round(
        st.get("peak_bytes_in_use", 0) / 2**30, 2)


def random_bf16_params(model, cfg):
    """Materialise params directly on device: eval_shape gives the pytree,
    each leaf is filled by a jitted PRNG draw in the LEAF's dtype — the f32
    tree a plain init would build (26.8 GB) never exists. Under
    quant='int8' the kernel_q leaves come out as random int8 (values don't
    matter for a throughput study; bytes and layout do)."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))

    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def leaf(key, shape, dtype):
        if dtype == jnp.int8:
            return jax.random.randint(key, shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        if dtype == jnp.float32:
            return jnp.abs(jax.random.normal(key, shape, jnp.float32)) * 0.01
        return (jax.random.normal(key, shape, jnp.bfloat16) * 0.02)

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    out = [leaf(k, tuple(s.shape), s.dtype) for k, s in zip(keys, leaves)]
    n_params = sum(int(np.prod(s.shape)) for s in leaves)
    n_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize for s in leaves)
    return jax.tree_util.tree_unflatten(treedef, out), n_params, n_bytes


def main():
    import argparse
    import dataclasses
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="int8: weight-only per-channel serving path "
                         "(llm_tpu.quant) -> docs/llm7b_int8_r03.json")
    cli = ap.parse_args()

    result = {"config": {"dim": 4096, "n_layers": 32, "n_heads": 32,
                         "intermediate": 11008, "vocab": 32000,
                         "dtype": "bfloat16", "quant": cli.quant}}
    cfg = LlamaConfig(max_seq_len=2048, dtype="bfloat16", use_flash=True,
                      quant=cli.quant)
    model = LlamaLM(cfg)
    t0 = time.time()
    params, n_params, n_bytes = random_bf16_params(model, cfg)
    jax.block_until_ready(params)
    result["n_params"] = n_params
    result["param_gb"] = round(n_bytes / 2**30, 2)
    in_use, peak = hbm_gb()
    result["hbm_after_params_gb"] = in_use
    log(f"params ready: {n_params/1e9:.2f}B, {in_use} GB in use, "
        f"{time.time()-t0:.0f}s")

    # ---- prefill latency (forward over the full prompt, kv cache filled)
    fwd = jax.jit(lambda p, t: model.apply(p, t)[0])
    prefill = {}
    for L in (512, 1024, 2048):
        toks = jnp.ones((1, L), jnp.int32)
        t0 = time.time()
        fwd(params, toks).block_until_ready()
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            fwd(params, toks).block_until_ready()
            times.append(time.time() - t0)
        prefill[str(L)] = {"ms": round(1e3 * min(times), 1),
                           "compile_s": round(compile_s, 1),
                           "prefill_tokens_per_s": round(L / min(times))}
        log(f"prefill {L}: {prefill[str(L)]}")
    result["prefill"] = prefill
    result["hbm_peak_after_prefill_gb"] = hbm_gb()[1]

    # ---- greedy decode tokens/s (kv-cache while_loop decoder). bs=1 is
    # HBM-bound (every token re-reads all 12.6GB of weights: the GEMV
    # regime); bs=8 amortises the weight stream across rows and is the
    # serving-relevant aggregate number.
    dec = Decoder(model, params, max_len=1024)
    prompt = list(range(1, 129))
    n_new = 128
    result["greedy_decode_by_batch"] = {}
    for bsz in (1, 8):
        prompts = [prompt] * bsz
        t0 = time.time()
        dec.greedy_batch(prompts, max_new_tokens=32)
        compile_s = time.time() - t0
        t0 = time.time()
        dec.greedy_batch(prompts, max_new_tokens=n_new)
        dt = time.time() - t0
        row = {
            "batch": bsz, "prompt_len": 128, "new_tokens": n_new,
            "tokens_per_s": round(bsz * n_new / dt, 1),
            "ms_per_token_per_seq": round(1e3 * dt / n_new, 1),
            "compile_s": round(compile_s, 1),
            "hbm_peak_gb": hbm_gb()[1],
        }
        result["greedy_decode_by_batch"][str(bsz)] = row
        log(f"decode bs={bsz}: {row}")
    result["greedy_decode"] = result["greedy_decode_by_batch"]["1"]

    # ---- SFT scale table (analytic; llm_tpu/sharding.py megatron TP +
    # optimizer-state sharding over dp): params bf16, grads bf16,
    # Adam m/v fp32, activations with per-block remat ~ 2 * B*L*dim*4
    # per in-flight block + logits-free chunked loss (sft.chunked_*)
    P = n_params
    rows = []
    for tp in (1, 2, 4, 8):
        per_dev_params = P * 2 / tp
        per_dev_opt = P * 8 / tp          # m+v fp32, sharded with tp
        per_dev_grads = P * 2 / tp
        act = 2 * 1 * 2048 * 4096 * 4     # B=1, L=2048 remat envelope
        total_gb = (per_dev_params + per_dev_opt + per_dev_grads + act) / 2**30
        rows.append({"tp": tp, "per_device_gb": round(total_gb, 1),
                     "fits_16gb": bool(total_gb < 15.0)})
    result["sft_7b_memory_table"] = {
        "assumptions": "bf16 params+grads, fp32 Adam m/v, B=1 L=2048, "
                       "per-block remat, chunked loss; states sharded tp-ways",
        "rows": rows,
        "conclusion": "7B SFT needs tp>=4 (or dp-sharded optimizer states, "
                      "ZeRO-style) on 16GB chips; inference fits on ONE chip",
    }

    out_name = ("llm7b_int8_r03.json" if cli.quant == "int8"
                else "llm7b_r03.json")
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            out_name)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
