"""Pallas causal attention kernels (TPU): forward AND backward.

The TPU-native replacement for the reference's CUDA flash-attn monkey patch
(llm/src/llms/language_models/longchat/llama_flash_attn_monkey_patch.py).

Grid design: every kernel runs a 3-D grid (batch*head, outer block, inner
block) with the INNER dimension iterating sequentially, carrying the online
accumulators in VMEM scratch. K/V (or Q/dO) therefore enter VMEM one
[128, D] block at a time — VMEM stays O(block) at ANY context length. (An
earlier version passed full-length [S, D] K/V blocks; with Mosaic's block
double-buffering that overflowed the 16MB scoped-VMEM budget at 8k fp32.)

* forward: per (bh, qb) stream k-blocks with online softmax; emits O and the
  per-row logsumexp, so the [L, S] score matrix never exists in HBM.
* backward: recomputes probabilities per block from (q, k, lse) in two
  kernels — dq over (bh, qb; kb inner) and dk/dv over (bh, kb; qb inner) —
  so the backward is O(block) memory too.

All matmuls run at HIGHEST precision for fp32 inputs and native single-pass
for bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30

# row statistics (lse, delta) are stored 128-lane REPLICATED ([.., L, 128])
# like the official TPU flash kernel: Mosaic block shapes need 128-wide
# minors, and with BLOCK_K == 128 a replicated [BQ, 128] row subtracts
# directly against every [BQ, BLOCK_K] score block — no transposes.
LANES = 128


def _prec(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                  *, block_q, block_k, scale, n_kb):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    precision = _prec(q_ref.dtype)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb <= qb)  # causal: later k-blocks contribute nothing
    def _update():
        q = q_ref[0]                                   # [BQ, D]
        k = k_ref[0]                                   # [BK, D]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m = m_ref[:, :1]                               # [BQ, 1]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        m_ref[:, :1] = m_new

    @pl.when(kb == n_kb - 1)
    def _emit():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l)                # [BQ, 1]
        lse_ref[0] = jax.lax.broadcast_in_dim(
            lse[:, 0], (block_q, LANES), (0,)).astype(lse_ref.dtype)


def _flash_fwd_impl(q, k, v, interpret=False):
    B, L, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qh = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    n_kb = S // BLOCK_K
    grid = (B * H, L // BLOCK_Q, n_kb)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale, n_kb=n_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, qb, kb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, qb, kb: (bh, kb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb, kb: (bh, qb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, D), jnp.float32),      # acc
            pltpu.VMEM((BLOCK_Q, LANES), jnp.float32),  # running max
            pltpu.VMEM((BLOCK_Q, LANES), jnp.float32),  # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=(qh.size + kh.size + vh.size) * q.dtype.itemsize),
        interpret=interpret,
    )(qh, kh, vh)
    # keep only one lane of the replicated statistics outside the kernel
    return jnp.moveaxis(out.reshape(B, H, L, D), 1, 2), lse[:, :, 0]


def _dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref,
               dq_acc, *, block_q, block_k, scale, n_kb):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    precision = _prec(q_ref.dtype)

    @pl.when(kb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(kb <= qb)
    def _update():
        q = q_ref[0].astype(jnp.float32)               # [BQ, D]
        do = do_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)               # [BK, D]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])                    # masked -> exp(NEG) = 0
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        ds = p * (dp - delta_ref[0]) * scale
        dq_acc[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(kb == n_kb - 1)
    def _emit():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, block_q, block_k, scale,
                n_qb):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    precision = _prec(k_ref.dtype)

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(qb >= kb)  # causal: earlier q-blocks see nothing of this k-block
    def _update():
        k = k_ref[0].astype(jnp.float32)               # [BK, D]
        v = v_ref[0].astype(jnp.float32)
        q = q_ref[0].astype(jnp.float32)               # [BQ, D]
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])                    # [BQ, BK]
        # dv[bk, d] = sum_q p[q, bk] * do[q, d]
        dv_acc[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        ds = p * (dp - delta_ref[0]) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(qb == n_qb - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g, interpret=False):
    B, L, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qh = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    oh = jnp.moveaxis(o, 2, 1).reshape(B * H, L, D)
    gh = jnp.moveaxis(g, 2, 1).reshape(B * H, L, D)
    # delta_i = rowsum(dO * O) — cheap elementwise reduce, fused by XLA;
    # replicated across 128 lanes for Mosaic-friendly block shapes
    delta = jnp.sum(gh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1)
    delta_rep = jnp.broadcast_to(delta[:, :, None], (B * H, L, LANES))
    lse_rep = jnp.broadcast_to(lse[:, :, None], (B * H, L, LANES))
    n_qb, n_kb = L // BLOCK_Q, S // BLOCK_K

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale, n_kb=n_kb),
        grid=(B * H, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb, kb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, qb, kb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, qb, kb: (bh, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D),
                               lambda bh, qb, kb: (bh, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((BLOCK_Q, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=2 * (qh.size + kh.size + vh.size)
            * q.dtype.itemsize),
        interpret=interpret,
    )(qh, gh, lse_rep, delta_rep, kh, vh)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale, n_qb=n_qb),
        grid=(B * H, n_kb, n_qb),
        in_specs=[
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb, qb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb, qb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, kb, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, kb, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, kb, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, kb, qb: (bh, qb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb, qb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb, qb: (bh, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, S, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_K, D), jnp.float32),
            pltpu.VMEM((BLOCK_K, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=2 * (qh.size + kh.size + vh.size)
            * q.dtype.itemsize),
        interpret=interpret,
    )(kh, vh, qh, gh, lse_rep, delta_rep)

    unflat = lambda x, n: jnp.moveaxis(x.reshape(B, H, n, D), 1, 2)
    return unflat(dq, L), unflat(dk, S), unflat(dv, S)


def _reference(q, k, v):
    B, L, H, D = q.shape
    S = k.shape[1]
    scores = jnp.einsum("blhd,bshd->bhls", q, k) / (D ** 0.5)
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (L, S), 1)
    scores = jnp.where((k_pos <= q_pos)[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhls,bshd->blhd", probs.astype(q.dtype), v)


@jax.custom_vjp
def flash_attention(q, k, v):
    """Causal attention; q [B, L, H, D], k/v [B, S, H, D] (heads already
    GQA-expanded). L, S, D must be multiples of 128."""
    return _flash_fwd_impl(q, k, v)[0]


def _fwd(q, k, v):
    o, lse = _flash_fwd_impl(q, k, v)
    return o, (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g)


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_reference_bwd(q, k, v, g):
    """Dense-recompute backward (testing oracle for the Pallas backward)."""
    _, vjp = jax.vjp(_reference, q, k, v)
    return vjp(g)
