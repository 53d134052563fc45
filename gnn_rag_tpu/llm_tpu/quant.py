"""Weight-only int8 quantization for the LLaMA serving path.

bs=1 greedy decode is an HBM-bound GEMV: every generated token re-reads all
model weights (docs/llm7b_r03.json measured 7B bf16 at 7.0 tokens/s —
~88GB/s effective over 12.6GB of params). Weight-only int8 halves the bytes
the GEMV streams, the single-chip lever for low-batch serving (new
capability: the reference serves fp16 via HF pipelines, llama.py:15-36).

Scheme: symmetric per-output-channel scales. For a kernel W [in, out],
    W ≈ W_q * scale[None, :],  W_q int8, scale = max|W| / 127 per column.
The scale commutes with the contraction, so the matmul runs directly on the
int8 weights (XLA fuses the int8->bf16 convert into the dot's operand read —
no dequantized copy ever hits HBM) and the [out]-vector scale is applied to
the activation output:
    x @ W ≈ (x @ W_q) * scale.

Usage:
    cfg_q = dataclasses.replace(cfg, quant="int8")
    qparams = quantize_params(params)           # f32/bf16 tree -> int8 tree
    logits, _ = LlamaLM(cfg_q).apply(qparams, tokens)
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# flax module names whose "kernel" is quantized (everything the decode GEMV
# streams except the token embedding, which is a per-token gather)
QUANT_KERNELS = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj", "lm_head")


class QuantDenseGeneral(nn.Module):
    """Drop-in for nn.DenseGeneral(use_bias=False) over int8 weights.

    Supports the two layouts the LM uses: trailing contraction axes
    (axis=-1 or (-2, -1)) and tuple features. Parameters:
      kernel_q int8 [in_size, out_size], scale f32 [out_size].
    """

    features: Union[int, Sequence[int]]
    axis: Union[int, Sequence[int]] = -1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = (self.features,) if isinstance(self.features, int) \
            else tuple(self.features)
        axes = (self.axis,) if isinstance(self.axis, int) else tuple(self.axis)
        n_axes = len(axes)
        # contraction axes must be the trailing ones (all LM call sites)
        assert tuple(a % x.ndim for a in axes) == tuple(
            range(x.ndim - n_axes, x.ndim)), axes
        in_size = int(np.prod(x.shape[-n_axes:]))
        out_size = int(np.prod(feats))
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_size, out_size), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (out_size,),
                           jnp.float32)
        x2 = x.reshape(x.shape[:-n_axes] + (in_size,)).astype(self.dtype)
        y = jax.lax.dot_general(x2, kernel_q.astype(self.dtype),
                                (((x2.ndim - 1,), (0,)), ((), ())))
        y = (y.astype(jnp.float32) * scale).astype(self.dtype)
        return y.reshape(x.shape[:-n_axes] + feats)


def quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[*in, *out] kernel -> (int8 [in_size, out_size], f32 scale [out_size]).

    The in/out split follows nn.DenseGeneral's layout (input dims lead).
    Out size is taken as the trailing dims' product matching the module's
    features — callers pass the flattened 2-D view."""
    w2 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w2), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w2 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _flatten_kernel(w: jnp.ndarray, module_name: str) -> jnp.ndarray:
    """Bring a bf16 LM kernel to the [in, out] orientation quantize_kernel
    expects. TDense (model.py) stores every 2-D kernel TRANSPOSED
    ([out, in], the HF orientation — avoids XLA relayout copies in the
    decode program), so 2-D kernels transpose here; 3-D shapes from legacy
    DenseGeneral trees flatten as before — q/k/v ([dim, H, Dh]) out dims
    trail, o_proj ([H, Dh, dim]) in dims lead."""
    if w.ndim == 2:
        return w.T
    if module_name == "o_proj":          # in dims (H, Dh) lead
        return w.reshape(-1, w.shape[-1])
    return w.reshape(w.shape[0], -1)     # q/k/v: out dims trail


def quantize_params(params) -> dict:
    """Map a full-precision LlamaLM param tree to the quant="int8" tree:
    every QUANT_KERNELS module's {kernel} becomes {kernel_q, scale};
    everything else (embeddings, norms) passes through unchanged.

    Memory note: both trees are alive during the walk. For checkpoints
    near the HBM limit (7B bf16 = 12.6GB on a 16GB chip), restore the
    checkpoint to HOST memory first (numpy leaves), quantize there, and
    device_put the int8 result — or materialise int8 weights directly
    (scripts/llm7b_study.py --quant int8 pattern)."""

    def walk(tree):
        out = {}
        for name, sub in tree.items():
            if name in QUANT_KERNELS and isinstance(sub, dict) \
                    and "kernel" in sub:
                q, scale = quantize_kernel(
                    _flatten_kernel(sub["kernel"], name))
                out[name] = {"kernel_q": q, "scale": scale}
            elif isinstance(sub, dict):
                out[name] = walk(sub)
            else:
                out[name] = sub
        return out

    return {"params": walk(params["params"])}


def param_bytes(params) -> int:
    return int(sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(params)))
