"""GSPMD partition rules for the LLM stack.

Mesh axes: ``dp`` (batch), ``tp`` (tensor). The reference reaches multi-GPU
scale only through deepspeed ZeRO-3 for the finetune (scripts/train.sh:8);
here the equivalent is parameter sharding specs consumed by jax.jit:

* attention q/k/v projections shard their HEAD axis over tp;
* o_proj shards its input-head axis over tp;
* MLP gate/up shard the intermediate axis, down_proj its input axis;
* embeddings / lm_head shard the vocab axis;
* everything else (norms) replicates.
XLA inserts the all-reduces — this is megatron-style TP without any hand
collective.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: str, x) -> P:
    """bf16 TDense kernels are stored TRANSPOSED [out, in] (model.py);
    int8 kernel_q stays [in, out] (quant.py). The megatron axis is the
    same either way: shard the head/intermediate/vocab dimension."""
    if x.ndim <= 1:
        return P()
    transposed = "kernel_q" not in path    # TDense vs QuantDenseGeneral
    if "tok_emb" in path or "lm_head" in path:
        # shard the vocab axis: tok_emb embedding and TDense lm_head are
        # [V, D]; only quant kernel_q is [D, V]. Branch on name, not shape —
        # a vocab <= dim (tiny/test configs) would fool a shape heuristic.
        return P(None, "tp") if not transposed else P("tp", None)
    if any(k in path for k in ("q_proj", "k_proj", "v_proj")):
        if x.ndim == 3:                    # legacy [dim, H, Dh]
            return P(None, "tp", None)
        return P("tp", None) if transposed else P(None, "tp")
    if "o_proj" in path:
        if x.ndim == 3:                    # legacy [H, Dh, dim]
            return P("tp", None, None)
        return P(None, "tp") if transposed else P("tp", None)
    if "gate_proj" in path or "up_proj" in path:
        return P("tp", None) if transposed else P(None, "tp")
    if "down_proj" in path:
        return P(None, "tp") if transposed else P("tp", None)
    return P()


def shard_llm_params(mesh: Mesh, params):
    def place(path, x):
        spec = param_spec(jax.tree_util.keystr(path), x)
        # fall back to replication when the axis doesn't divide
        try:
            return jax.device_put(x, NamedSharding(mesh, spec))
        except Exception:
            return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map_with_path(place, params)


def batch_spec() -> P:
    return P("dp")
