"""Pallas causal attention kernel (TPU).

The TPU-native replacement for the reference's CUDA flash-attn monkey patch
(llm/src/llms/language_models/longchat/llama_flash_attn_monkey_patch.py).
Per (batch*head, q-block) grid cell the kernel streams K/V blocks with an
online-softmax accumulator, so the [L, S] score matrix never materialises in
HBM. Backward runs as autodiff of the XLA reference (recompute) via
custom_vjp — exact gradients, no second kernel needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k, scale):
    qb = pl.program_id(1)
    q = q_ref[0]                                   # [BQ, D]
    S = k_ref.shape[1]
    D = q.shape[-1]
    n_kb = S // block_k

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]          # [BK, D]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
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
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    # causal: only k-blocks up to (and including) this q-block do work
    acc = jnp.zeros((block_q, D), jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, qb + 1, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, interpret=False):
    B, L, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qh = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * H, S, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * H, S, D)
    grid = (B * H, L // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=BLOCK_Q, block_k=BLOCK_K,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
            pl.BlockSpec((1, S, D), lambda bh, qb: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qb: (bh, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * S * D, transcendentals=B * H * L * S,
            bytes_accessed=(qh.size + kh.size + vh.size) * q.dtype.itemsize),
        interpret=interpret,
    )(qh, kh, vh)
    return jnp.moveaxis(out.reshape(B, H, L, D), 1, 2)


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
    return _flash_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
