"""Pallas causal attention kernels (TPU): forward AND backward.

The TPU-native replacement for the reference's CUDA flash-attn monkey patch
(llm/src/llms/language_models/longchat/llama_flash_attn_monkey_patch.py).
Per (batch*head, q-block) grid cell the forward streams K/V blocks with an
online-softmax accumulator, so the [L, S] score matrix never materialises in
HBM; it additionally emits the per-row logsumexp. The backward recomputes
probabilities per block from (q, k, lse) in two Pallas kernels — dq over
q-blocks, dk/dv over k-blocks — so the backward is O(block) memory too
(round 1 fell back to autodiff of the dense reference, materialising the
[L, S] scores the kernel exists to avoid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


# row statistics (lse, delta) are stored 128-lane REPLICATED ([.., L, 128])
# like the official TPU flash kernel: Mosaic block shapes need 128-wide
# minors, and with BLOCK_K == 128 a replicated [BQ, 128] row subtracts
# directly against every [BQ, BLOCK_K] score block — no transposes.
LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k,
                  scale):
    qb = pl.program_id(1)
    q = q_ref[0]                                   # [BQ, D]
    S = k_ref.shape[1]
    D = q.shape[-1]
    n_kb = S // block_k
    # fp32 inputs get exact MXU passes; bf16 stays native single-pass
    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32 else None)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]          # [BK, D]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return acc, m_new, l_new

    # causal: only k-blocks up to (and including) this q-block do work
    acc = jnp.zeros((block_q, D), jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, qb + 1, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))                   # [BQ, 1]
    lse_ref[0] = jax.lax.broadcast_in_dim(
        lse[:, 0], (block_q, LANES), (0,)).astype(lse_ref.dtype)


def _flash_fwd_impl(q, k, v, interpret=False):
    B, L, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qh = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    grid = (B * H, L // BLOCK_Q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb: (bh, qb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=(qh.size + kh.size + vh.size) * q.dtype.itemsize),
        interpret=interpret,
    )(qh, kh, vh)
    # keep only one lane of the replicated statistics outside the kernel
    return jnp.moveaxis(out.reshape(B, H, L, D), 1, 2), lse[:, :, 0]


def _dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, *,
               block_q, block_k, scale):
    qb = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)               # [BQ, D]
    do = do_ref[0].astype(jnp.float32)
    lse_rep = lse_ref[0]                           # [BQ, LANES] replicated
    delta_rep = delta_ref[0]
    D = q.shape[-1]
    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32 else None)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_rep)                   # masked -> exp(NEG) = 0
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        ds = p * (dp - delta_rep) * scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=precision)

    dq = jnp.zeros((block_q, D), jnp.float32)
    dq = jax.lax.fori_loop(0, qb + 1, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, block_q, block_k, scale):
    kb = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)               # [BK, D]
    v = v_ref[0].astype(jnp.float32)
    L = q_ref.shape[1]
    D = k.shape[-1]
    n_qb = L // block_q
    precision = (jax.lax.Precision.HIGHEST
                 if k_ref.dtype == jnp.float32 else None)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse_rep = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        delta_rep = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                 + qb * block_q)
        k_pos = (jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                 + kb * block_k)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_rep)                   # [BQ, BK]
        # dv[bk, d] = sum_q p[q, bk] * do[q, d]
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=precision)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        ds = p * (dp - delta_rep) * scale
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=precision)
        return dk, dv

    dk = jnp.zeros((block_k, D), jnp.float32)
    dv = jnp.zeros((block_k, D), jnp.float32)
    # causal: only q-blocks at or after this k-block contribute
    dk, dv = jax.lax.fori_loop(kb, n_qb, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


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

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale),
        grid=(B * H, L // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=2 * (qh.size + kh.size + vh.size)
            * q.dtype.itemsize),
        interpret=interpret,
    )(qh, gh, lse_rep, delta_rep, kh, vh)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale),
        grid=(B * H, S // BLOCK_K),
        in_specs=[
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb: (bh, kb, 0)),
            pl.BlockSpec((1, L, D), lambda bh, kb: (bh, 0, 0)),
            pl.BlockSpec((1, L, D), lambda bh, kb: (bh, 0, 0)),
            pl.BlockSpec((1, L, LANES), lambda bh, kb: (bh, 0, 0)),
            pl.BlockSpec((1, L, LANES), lambda bh, kb: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb: (bh, kb, 0)),
            pl.BlockSpec((1, BLOCK_K, D), lambda bh, kb: (bh, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, S, D), v.dtype),
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
