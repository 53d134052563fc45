"""Fused Pallas scatter: tiled one-hot matmul on the MXU.

Replaces the XLA scatter-add in message passing (the ``fact2tail_mat @ vals``
of reasongnn.py:84) with a scatter-free formulation over the tile-sorted
layout of data.kernel_layout:

  for each chunk c of TILE_F facts (all targeting one entity tile t):
      onehot[TILE_F, TILE_E] = (scatter_idx - t*TILE_E == iota)
      out[t] += onehot^T @ values[c]            # MXU matmul, VMEM accumulate

The TPU grid is executed sequentially, so consecutive chunks of the same
entity tile accumulate into the same VMEM-resident output block; a fresh tile
zero-inits its block first. Cost: O(F * TILE_E * C) MACs instead of a
serialized scatter — and the padded chunks make every shape static.

Backward of a linear scatter is a gather: dV[b,f] = g[b, scatter_idx[b,f]].
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.kernel_layout import TILE_E, TILE_F


def _scatter_kernel(chunk_tiles_ref, scatter_ref, values_ref, out_ref, *,
                    tile_e: int, tile_f: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    et = chunk_tiles_ref[b, c]
    prev_et = jnp.where(c > 0, chunk_tiles_ref[b, jnp.maximum(c - 1, 0)], -1)

    @pl.when(jnp.logical_or(c == 0, et != prev_et))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = scatter_ref[0, pl.ds(c, 1), :]                     # [1, TILE_F]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    onehot_t = ((idx - et * tile_e) == rows).astype(values_ref.dtype)
    # fp32 values -> exact MXU passes; bf16 values -> fast native bf16
    precision = (jax.lax.Precision.HIGHEST
                 if values_ref.dtype == jnp.float32 else None)
    contrib = jax.lax.dot_general(
        onehot_t, values_ref[0, 0],                          # [TILE_E, TILE_F] @ [TILE_F, C]
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                 # [TILE_E, C]
    out_ref[0] += contrib.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def scatter_mm(values: jnp.ndarray, scatter_idx: jnp.ndarray,
               chunk_tiles: jnp.ndarray, num_entities: int) -> jnp.ndarray:
    """values [B, Fp, C] (kernel layout order), scatter_idx [B, Fp] (-1 pad),
    chunk_tiles [B, NC] -> [B, E, C] float32."""
    return _scatter_mm_fwd_impl(values, scatter_idx, chunk_tiles, num_entities)


def _scatter_mm_fwd_impl(values, scatter_idx, chunk_tiles, num_entities,
                         interpret: bool = False):
    B, Fp, C = values.shape
    NC = chunk_tiles.shape[1]
    assert Fp == NC * TILE_F, (Fp, NC)
    # full [NC, TILE_F] index block per sample (reused across the grid row)
    scatter_idx = scatter_idx.reshape(B, NC, TILE_F)
    values = values.reshape(B, NC, TILE_F, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, TILE_F, C), lambda b, c, ct: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_E, C),
                               lambda b, c, ct: (b, ct[b, c], 0)),
    )
    kernel = functools.partial(_scatter_kernel, tile_e=TILE_E, tile_f=TILE_F)
    flops = 2 * B * Fp * TILE_E * C
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_entities, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=values.size * values.dtype.itemsize
            + B * num_entities * C * 4,
            transcendentals=0),
        interpret=interpret,
    )(chunk_tiles, scatter_idx, values)


def _scatter_mm_fwd(values, scatter_idx, chunk_tiles, num_entities):
    out = _scatter_mm_fwd_impl(values, scatter_idx, chunk_tiles, num_entities)
    return out, (scatter_idx, values.dtype)


def _scatter_mm_bwd(num_entities, res, g):
    scatter_idx, vdtype = res
    safe = jnp.maximum(scatter_idx, 0)
    dV = jnp.take_along_axis(g, safe[..., None], axis=1)
    dV = jnp.where((scatter_idx >= 0)[..., None], dV, 0.0).astype(vdtype)
    return dV, None, None


scatter_mm.defvjp(_scatter_mm_fwd, _scatter_mm_bwd)


# --------------------------------------------------------------------------
# Fused gate + scatter: the whole ReaRev message op in one kernel.
#
# For one GNN step and direction (reasongnn.py:61-116) the per-fact work is
#     val_j = relu((rel_feat[rels] @ W + b) * ins_j) * prior
# followed by scatter-add into entities. Here the rel projection, the J
# instruction gates, the prior scaling (folded into the one-hot matrix), and
# the scatter all happen per chunk in VMEM; nothing of width J*D ever touches
# HBM. Inputs are in kernel-layout order.
# --------------------------------------------------------------------------


def _fused_kernel(chunk_tiles_ref, scatter_ref, prior_ref, fact_rel_ref,
                  w_ref, b_ref, ins_ref, out_ref, *, tile_e: int, tile_f: int,
                  num_ins: int, dim: int, apply_relu: bool):
    b = pl.program_id(0)
    c = pl.program_id(1)
    et = chunk_tiles_ref[b, c]
    prev_et = jnp.where(c > 0, chunk_tiles_ref[b, jnp.maximum(c - 1, 0)], -1)

    @pl.when(jnp.logical_or(c == 0, et != prev_et))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    dtype = fact_rel_ref.dtype
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
    rl = jax.lax.dot_general(
        fact_rel_ref[0, 0], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) + b_ref[...]                    # [TILE_F, D]
    rl = rl.astype(dtype)

    idx = scatter_ref[0, pl.ds(c, 1), :]                     # [1, TILE_F]
    pri = prior_ref[0, pl.ds(c, 1), :]                       # [1, TILE_F]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    onehot_pri = jnp.where((idx - et * tile_e) == rows,
                           pri, 0.0).astype(dtype)           # [TILE_E, TILE_F]

    # all J gates in ONE [TILE_E, TILE_F] @ [TILE_F, J*D] matmul: J*D lanes
    # utilise the MXU better than J separate D-lane products
    vals = []
    for j in range(num_ins):
        ins_j = ins_ref[0, pl.ds(j, 1), :]                   # [1, D]
        val = rl * ins_j
        if apply_relu:
            val = jnp.maximum(val, 0.0)
        vals.append(val)
    val_all = jnp.concatenate(vals, axis=1) if num_ins > 1 else vals[0]
    contrib = jax.lax.dot_general(
        onehot_pri, val_all,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                 # [TILE_E, J*D]
    for j in range(num_ins):
        out_ref[0, j] += contrib[:, j * dim:(j + 1) * dim].astype(out_ref.dtype)


def _fused_fwd_impl(fact_rel, w, bias, ins, prior, scatter_idx, chunk_tiles,
                    num_entities, apply_relu, interpret=False):
    B, Fp, D = fact_rel.shape
    J = ins.shape[1]
    NC = chunk_tiles.shape[1]
    assert Fp == NC * TILE_F, (Fp, NC)
    scatter_idx = scatter_idx.reshape(B, NC, TILE_F)
    prior = prior.reshape(B, NC, TILE_F)
    fact_rel = fact_rel.reshape(B, NC, TILE_F, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, TILE_F, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((D, D), lambda b, c, ct: (0, 0)),
            pl.BlockSpec((1, D), lambda b, c, ct: (0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, J, TILE_E, D),
                               lambda b, c, ct: (b, 0, ct[b, c], 0)),
    )
    kernel = functools.partial(_fused_kernel, tile_e=TILE_E, tile_f=TILE_F,
                               num_ins=J, dim=D, apply_relu=apply_relu)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, J, num_entities, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Fp * D * (D + J * TILE_E),
            bytes_accessed=fact_rel.size * fact_rel.dtype.itemsize
            + B * num_entities * J * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(chunk_tiles, scatter_idx, prior, fact_rel, w, bias.reshape(1, D), ins)


def _fused_kernel_v2(chunk_starts_ref, scatter_ref, prior_ref, fact_rel_hbm,
                     w_ref, b_ref, ins_ref, out_ref, fr_buf, dma_sems, *,
                     tile_e: int, tile_f: int, num_ins: int, dim: int,
                     apply_relu: bool):
    """One grid cell per (sample, entity tile); loops over the tile's chunk
    range with double-buffered DMA of the fact_rel chunks from HBM. Cuts the
    per-chunk grid overhead of _fused_kernel by ~#chunks-per-tile."""
    b = pl.program_id(0)
    et = pl.program_id(1)
    start = chunk_starts_ref[b, et]
    end = chunk_starts_ref[b, et + 1]
    dtype = fr_buf.dtype
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)

    out_ref[...] = jnp.zeros_like(out_ref)

    def dma(slot, c):
        return pltpu.make_async_copy(fact_rel_hbm.at[b, c], fr_buf.at[slot],
                                     dma_sems.at[slot])

    @pl.when(start < end)
    def _first():
        dma(0, start).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)

    def body(c, _):
        slot = (c - start) % 2
        nxt = (c - start + 1) % 2

        @pl.when(c + 1 < end)
        def _prefetch():
            dma(nxt, c + 1).start()

        dma(slot, c).wait()
        rl = jax.lax.dot_general(
            fr_buf[slot], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) + b_ref[...]
        rl = rl.astype(dtype)
        idx = scatter_ref[0, pl.ds(c, 1), :]
        pri = prior_ref[0, pl.ds(c, 1), :]
        onehot_pri = jnp.where((idx - et * tile_e) == rows, pri,
                               0.0).astype(dtype)
        for j in range(num_ins):
            ins_j = ins_ref[0, pl.ds(j, 1), :]
            val = rl * ins_j
            if apply_relu:
                val = jnp.maximum(val, 0.0)
            contrib = jax.lax.dot_general(
                onehot_pri, val, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            out_ref[0, j] += contrib.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(start, end, body, 0)


def _fused_fwd_impl_v2(fact_rel, w, bias, ins, prior, scatter_idx,
                       chunk_starts, num_entities, apply_relu,
                       interpret=False):
    B, Fp, D = fact_rel.shape
    J = ins.shape[1]
    NC = Fp // TILE_F
    n_tiles = num_entities // TILE_E
    # manual chunk DMA requires a 128-aligned last dim: pad the feature lanes
    # (w gets matching zero rows, so the projection result is unchanged)
    D_pad = -(-D // 128) * 128
    if D_pad != D:
        fact_rel = jnp.pad(fact_rel, ((0, 0), (0, 0), (0, D_pad - D)))
        w = jnp.pad(w, ((0, D_pad - D), (0, 0)))
    scatter_idx = scatter_idx.reshape(B, NC, TILE_F)
    prior = prior.reshape(B, NC, TILE_F)
    fact_rel = fact_rel.reshape(B, NC, TILE_F, D_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, NC, TILE_F), lambda b, t, cs: (b, 0, 0)),
            pl.BlockSpec((1, NC, TILE_F), lambda b, t, cs: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),      # fact_rel stays in HBM
            pl.BlockSpec((D_pad, D), lambda b, t, cs: (0, 0)),
            pl.BlockSpec((1, D), lambda b, t, cs: (0, 0)),
            pl.BlockSpec((1, J, D), lambda b, t, cs: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, J, TILE_E, D), lambda b, t, cs: (b, 0, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_F, D_pad), fact_rel.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fused_kernel_v2, tile_e=TILE_E, tile_f=TILE_F,
                               num_ins=J, dim=D, apply_relu=apply_relu)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, J, num_entities, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Fp * D * (D + J * TILE_E),
            bytes_accessed=fact_rel.size * fact_rel.dtype.itemsize
            + B * num_entities * J * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(chunk_starts, scatter_idx, prior, fact_rel, w, bias.reshape(1, D), ins)


def _fused_bwd_kernel(chunk_tiles_ref, scatter_ref, prior_ref,
                      fact_rel_ref, w_ref, b_ref, ins_ref, g_ref,
                      dfr_ref, dprior_ref, dins_ref, dw_ref, db_ref, *,
                      tile_e: int, tile_f: int, num_ins: int, dim: int,
                      apply_relu: bool):
    """Backward of the fused gate-scatter, per chunk in VMEM.

    The gather of the output grad at each fact's target — the memory hog of
    the XLA backward — is itself a one-hot matmul on the MXU (with the prior
    optionally folded into the one-hot, like the forward). dW/db accumulate
    across the whole sequential grid in VMEM, dins per sample,
    dfact_rel/dprior are written per chunk. Lane-dim dynamic slicing is
    unsupported on TPU, so every reduction/transpose is expressed through
    dot_general dimension numbers."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    et = chunk_tiles_ref[b, c]

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _zero_global():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    @pl.when(c == 0)
    def _zero_per_sample():
        dins_ref[...] = jnp.zeros_like(dins_ref)

    precision = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    fr = fact_rel_ref[0, 0].astype(f32)                      # [TF, D]
    rl = jax.lax.dot_general(fr, w_ref[...].astype(f32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=precision) + b_ref[...].astype(f32)

    idx = scatter_ref[0, pl.ds(c, 1), :]                     # [1, TF]
    pri = prior_ref[0, pl.ds(c, 1), :].astype(f32)           # [1, TF]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    match = (idx - et * tile_e) == rows                      # [TE, TF]
    onehot_t = match.astype(f32)
    onehot_pri_t = jnp.where(match, pri, 0.0).astype(f32)
    ones_row = jnp.ones((1, dim), f32)

    drl = jnp.zeros((tile_f, dim), f32)
    dpri_row = jnp.zeros((1, tile_f), f32)
    for j in range(num_ins):
        g_j = g_ref[0, j].astype(f32)                        # [TE, D]
        # gb_j[f, d] = sum_e onehot_t[e, f] * g_j[e, d]
        gb_j = jax.lax.dot_general(onehot_t, g_j, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=precision)      # [TF, D]
        gbp_j = jax.lax.dot_general(onehot_pri_t, g_j,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32,
                                    precision=precision)     # prior-scaled
        ins_j = ins_ref[0, pl.ds(j, 1), :].astype(f32)       # [1, D]
        pre_j = rl * ins_j
        act_j = jnp.maximum(pre_j, 0.0) if apply_relu else pre_j
        # dprior_row[1, f] = sum_d gb_j[f, d] * act_j[f, d]
        dpri_row += jax.lax.dot_general(ones_row, gb_j * act_j,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32,
                                        precision=precision)
        dval_j = gbp_j
        if apply_relu:
            dval_j = jnp.where(pre_j > 0, dval_j, 0.0)
        drl += dval_j * ins_j
        dins_ref[0, pl.ds(j, 1), :] += jnp.sum(dval_j * rl, axis=0,
                                               keepdims=True
                                               ).astype(dins_ref.dtype)

    dfr = jax.lax.dot_general(drl, w_ref[...].astype(f32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32,
                              precision=precision)           # [TF, D]
    dfr_ref[0, 0] = dfr.astype(dfr_ref.dtype)
    dprior_ref[0, pl.ds(c, 1), :] = dpri_row.astype(dprior_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        fr, drl, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=precision).astype(dw_ref.dtype)
    db_ref[...] += jnp.sum(drl, axis=0, keepdims=True).astype(db_ref.dtype)


def _fused_bwd_pallas_impl(fact_rel, w, bias, ins, prior, scatter_idx,
                           chunk_tiles, g, apply_relu, interpret=False):
    B, Fp, D = fact_rel.shape
    J = ins.shape[1]
    NC = chunk_tiles.shape[1]
    scatter3 = scatter_idx.reshape(B, NC, TILE_F)
    prior3 = prior.reshape(B, NC, TILE_F)
    fact_rel4 = fact_rel.reshape(B, NC, TILE_F, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, TILE_F, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((D, D), lambda b, c, ct: (0, 0)),
            pl.BlockSpec((1, D), lambda b, c, ct: (0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, TILE_E, D), lambda b, c, ct: (b, 0, ct[b, c], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE_F, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, TILE_F), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((D, D), lambda b, c, ct: (0, 0)),
            pl.BlockSpec((1, D), lambda b, c, ct: (0, 0)),
        ],
    )
    kernel = functools.partial(_fused_bwd_kernel, tile_e=TILE_E, tile_f=TILE_F,
                               num_ins=J, dim=D, apply_relu=apply_relu)
    dfr4, dprior3, dins, dw, db = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NC, TILE_F, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, TILE_F), jnp.float32),
            jax.ShapeDtypeStruct((B, J, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_tiles, scatter3, prior3, fact_rel4, w, bias.reshape(1, D), ins, g)
    dfr = dfr4.reshape(B, Fp, D).astype(fact_rel.dtype)
    dprior = dprior3.reshape(B, Fp).astype(prior.dtype)
    return (dfr, dw.astype(w.dtype), db[0].astype(bias.dtype),
            dins.astype(ins.dtype), dprior)


def fused_gate_scatter_reference(fact_rel, w, bias, ins, prior, scatter_idx,
                                 chunk_tiles, num_entities, apply_relu=True):
    """XLA fallback with identical semantics. Returns [B, J, E, D]."""
    rl = jnp.einsum("bfd,de->bfe", fact_rel, w) + bias
    val = rl[:, :, None, :] * ins[:, None, :, :]
    if apply_relu:
        val = jax.nn.relu(val)
    val = val * prior[:, :, None, None]
    B, Fp, J, D = val.shape
    out = scatter_mm_reference(val.reshape(B, Fp, J * D), scatter_idx,
                               chunk_tiles, num_entities)
    return jnp.moveaxis(out.reshape(B, num_entities, J, D), 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_gate_scatter(fact_rel, w, bias, ins, prior, scatter_idx,
                       chunk_tiles, num_entities, apply_relu=True):
    """[B,Fp,D] facts -> [B,J,E,D] aggregated neighbour features."""
    return _fused_fwd_impl(fact_rel, w, bias, ins, prior, scatter_idx,
                           chunk_tiles, num_entities, apply_relu)


def _fused_fwd(fact_rel, w, bias, ins, prior, scatter_idx, chunk_tiles,
               num_entities, apply_relu):
    out = _fused_fwd_impl(fact_rel, w, bias, ins, prior, scatter_idx,
                          chunk_tiles, num_entities, apply_relu)
    return out, (fact_rel, w, bias, ins, prior, scatter_idx, chunk_tiles)


def _fused_bwd(num_entities, apply_relu, res, g):
    fact_rel, w, bias, ins, prior, scatter_idx, chunk_tiles = res
    if jax.default_backend() == "tpu" and chunk_tiles is not None:
        grads = _fused_bwd_pallas_impl(fact_rel, w, bias, ins, prior,
                                       scatter_idx, chunk_tiles, g,
                                       apply_relu)
        return (*grads, None, None)
    B, Fp, D = fact_rel.shape
    J = ins.shape[1]
    # recompute activations (cheaper than stashing [B,Fp,J,D])
    rl = jnp.einsum("bfd,de->bfe", fact_rel, w) + bias           # [B,Fp,D]
    pre = rl[:, :, None, :] * ins[:, None, :, :]                 # [B,Fp,J,D]
    act = jax.nn.relu(pre) if apply_relu else pre
    # gather the output grad ([B,J,E,D]) at each fact's scatter target
    safe = jnp.maximum(scatter_idx, 0)
    g_flat = jnp.moveaxis(g, 1, 2).reshape(B, -1, J * D)     # [B,E,J*D]
    gb = jnp.take_along_axis(g_flat, safe[..., None], axis=1)
    gb = jnp.where((scatter_idx >= 0)[..., None], gb, 0.0)
    gb = gb.reshape(B, Fp, J, D)
    dprior = jnp.einsum("bfjd,bfjd->bf", gb, act)
    dval = gb * prior[:, :, None, None]
    if apply_relu:
        dval = jnp.where(pre > 0, dval, 0.0)
    drl = jnp.einsum("bfjd,bjd->bfd", dval, ins)
    dins = jnp.einsum("bfjd,bfd->bjd", dval, rl)
    dfact_rel = jnp.einsum("bfd,ed->bfe", drl, w)
    dw = jnp.einsum("bfd,bfe->de", fact_rel, drl)
    dbias = jnp.sum(drl, axis=(0, 1))
    return (dfact_rel.astype(fact_rel.dtype), dw.astype(w.dtype),
            dbias.astype(bias.dtype), dins.astype(ins.dtype),
            dprior.astype(prior.dtype), None, None)


fused_gate_scatter.defvjp(_fused_fwd, _fused_bwd)


def scatter_mm_reference(values, scatter_idx, chunk_tiles, num_entities):
    """XLA fallback with identical semantics (for CPU tests)."""
    from .segment import batched_segment_sum
    mask = (scatter_idx >= 0).astype(values.dtype)
    vals = values * mask[..., None]
    return batched_segment_sum(
        vals, jnp.maximum(scatter_idx, 0), num_entities).astype(jnp.float32)


def scatter_to_entities(values, scatter_idx, chunk_tiles, num_entities,
                        use_pallas: bool = True):
    if use_pallas:
        return scatter_mm(values, scatter_idx, chunk_tiles, num_entities)
    return scatter_mm_reference(values, scatter_idx, chunk_tiles, num_entities)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_gate_scatter_v2(fact_rel, w, bias, ins, prior, scatter_idx,
                          chunk_starts, chunk_tiles, num_entities,
                          apply_relu=True):
    """Tile-per-cell variant with double-buffered chunk DMA (feature lanes
    padded to 128 for DMA alignment). chunk_tiles only feeds the backward."""
    return _fused_fwd_impl_v2(fact_rel, w, bias, ins, prior, scatter_idx,
                              chunk_starts, num_entities, apply_relu)


def _fused_v2_fwd(fact_rel, w, bias, ins, prior, scatter_idx, chunk_starts,
                  chunk_tiles, num_entities, apply_relu):
    out = _fused_fwd_impl_v2(fact_rel, w, bias, ins, prior, scatter_idx,
                             chunk_starts, num_entities, apply_relu)
    return out, (fact_rel, w, bias, ins, prior, scatter_idx, chunk_tiles)


def _fused_v2_bwd(num_entities, apply_relu, res, g):
    return _fused_bwd(num_entities, apply_relu, res, g) + (None,)


fused_gate_scatter_v2.defvjp(_fused_v2_fwd, _fused_v2_bwd)


# --------------------------------------------------------------------------
# v3: gate + scatter over ALREADY-PROJECTED fact values.
#
# rel_linear is linear, so projecting the [R, D] relation TABLE once in XLA
# (near-peak MXU, R ~ 2k rows) and gathering the projected rows is exactly
# the reference's per-fact relu(rel_linear(rel_feat[rels]) * ins) — but the
# kernel no longer runs a [TILE_F, D] @ [D, D] matmul per chunk, carries no
# w/bias blocks, and its backward needs no cross-grid dW/db accumulators
# (those gradients flow through the XLA table matmul + gather).
# --------------------------------------------------------------------------


def _fused_kernel_v3(chunk_tiles_ref, scatter_ref, prior_ref, fact_rl_ref,
                     ins_ref, out_ref, *, tile_e: int, tile_f: int,
                     num_ins: int, dim: int, apply_relu: bool):
    b = pl.program_id(0)
    c = pl.program_id(1)
    et = chunk_tiles_ref[b, c]
    prev_et = jnp.where(c > 0, chunk_tiles_ref[b, jnp.maximum(c - 1, 0)], -1)

    @pl.when(jnp.logical_or(c == 0, et != prev_et))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    dtype = fact_rl_ref.dtype
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
    rl = fact_rl_ref[0, 0]                                   # [TILE_F, D]

    idx = scatter_ref[0, pl.ds(c, 1), :]                     # [1, TILE_F]
    pri = prior_ref[0, pl.ds(c, 1), :]                       # [1, TILE_F]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    onehot_pri = jnp.where((idx - et * tile_e) == rows,
                           pri, 0.0).astype(dtype)           # [TILE_E, TILE_F]

    vals = []
    for j in range(num_ins):
        ins_j = ins_ref[0, pl.ds(j, 1), :]                   # [1, D]
        val = rl * ins_j
        if apply_relu:
            val = jnp.maximum(val, 0.0)
        vals.append(val)
    val_all = jnp.concatenate(vals, axis=1) if num_ins > 1 else vals[0]
    contrib = jax.lax.dot_general(
        onehot_pri, val_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                                 # [TILE_E, J*D]
    for j in range(num_ins):
        out_ref[0, j] += contrib[:, j * dim:(j + 1) * dim].astype(out_ref.dtype)


def _fused_v3_fwd_impl(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                       num_entities, apply_relu, interpret=False):
    B, Fp, D = fact_rl.shape
    J = ins.shape[1]
    NC = chunk_tiles.shape[1]
    tile_f = Fp // NC
    scatter_idx = scatter_idx.reshape(B, NC, tile_f)
    prior = prior.reshape(B, NC, tile_f)
    fact_rl = fact_rl.reshape(B, NC, tile_f, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, J, TILE_E, D),
                               lambda b, c, ct: (b, 0, ct[b, c], 0)),
    )
    kernel = functools.partial(_fused_kernel_v3, tile_e=TILE_E, tile_f=tile_f,
                               num_ins=J, dim=D, apply_relu=apply_relu)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, J, num_entities, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Fp * J * TILE_E * D,
            bytes_accessed=fact_rl.size * fact_rl.dtype.itemsize
            + B * num_entities * J * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(chunk_tiles, scatter_idx, prior, fact_rl, ins)


def _fused_bwd_kernel_v3(chunk_tiles_ref, scatter_ref, prior_ref,
                         fact_rl_ref, ins_ref, g_ref,
                         dfr_ref, dprior_ref, dins_ref, *,
                         tile_e: int, tile_f: int, num_ins: int, dim: int,
                         apply_relu: bool):
    """Backward of v3: per-chunk gather-as-matmul of the output grad; no
    global accumulators (w/bias grads live in the XLA table projection)."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    et = chunk_tiles_ref[b, c]

    @pl.when(c == 0)
    def _zero_per_sample():
        dins_ref[...] = jnp.zeros_like(dins_ref)

    precision = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    rl = fact_rl_ref[0, 0].astype(f32)                       # [TF, D]

    idx = scatter_ref[0, pl.ds(c, 1), :]                     # [1, TF]
    pri = prior_ref[0, pl.ds(c, 1), :].astype(f32)           # [1, TF]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    match = (idx - et * tile_e) == rows                      # [TE, TF]
    onehot_t = match.astype(f32)
    ones_row = jnp.ones((1, dim), f32)
    # each fact matches exactly one entity row, so the prior-scaled gather
    # gbp_j = onehot_pri^T g_j equals pri * (onehot^T g_j) — one matmul per
    # instruction instead of two, the scaling on the VPU
    pri_col = jax.lax.dot_general(pri, jnp.ones((1, 1), f32),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32,
                                  precision=precision)         # [TF, 1]

    dfr = jnp.zeros((tile_f, dim), f32)
    dpri_row = jnp.zeros((1, tile_f), f32)
    for j in range(num_ins):
        g_j = g_ref[0, j].astype(f32)                        # [TE, D]
        gb_j = jax.lax.dot_general(onehot_t, g_j, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=precision)      # [TF, D]
        ins_j = ins_ref[0, pl.ds(j, 1), :].astype(f32)       # [1, D]
        pre_j = rl * ins_j
        act_j = jnp.maximum(pre_j, 0.0) if apply_relu else pre_j
        dpri_row += jax.lax.dot_general(ones_row, gb_j * act_j,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32,
                                        precision=precision)
        dval_j = gb_j * pri_col
        if apply_relu:
            dval_j = jnp.where(pre_j > 0, dval_j, 0.0)
        dfr += dval_j * ins_j
        dins_ref[0, pl.ds(j, 1), :] += jnp.sum(dval_j * rl, axis=0,
                                               keepdims=True
                                               ).astype(dins_ref.dtype)

    dfr_ref[0, 0] = dfr.astype(dfr_ref.dtype)
    dprior_ref[0, pl.ds(c, 1), :] = dpri_row.astype(dprior_ref.dtype)


def _fused_v3_bwd_pallas_impl(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                              g, apply_relu, interpret=False):
    B, Fp, D = fact_rl.shape
    J = ins.shape[1]
    NC = chunk_tiles.shape[1]
    tile_f = Fp // NC
    scatter3 = scatter_idx.reshape(B, NC, tile_f)
    prior3 = prior.reshape(B, NC, tile_f)
    fact_rl4 = fact_rl.reshape(B, NC, tile_f, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, TILE_E, D), lambda b, c, ct: (b, 0, ct[b, c], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
    )
    kernel = functools.partial(_fused_bwd_kernel_v3, tile_e=TILE_E,
                               tile_f=tile_f, num_ins=J, dim=D,
                               apply_relu=apply_relu)
    dfr4, dprior3, dins = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NC, tile_f, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, tile_f), jnp.float32),
            jax.ShapeDtypeStruct((B, J, D), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_tiles, scatter3, prior3, fact_rl4, ins, g)
    dfr = dfr4.reshape(B, Fp, D).astype(fact_rl.dtype)
    dprior = dprior3.reshape(B, Fp).astype(prior.dtype)
    return dfr, dins.astype(ins.dtype), dprior


def gated_scatter_v3_reference(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                               num_entities, apply_relu=True):
    """XLA fallback: same semantics over projected fact values."""
    val = fact_rl[:, :, None, :] * ins[:, None, :, :]
    if apply_relu:
        val = jax.nn.relu(val)
    val = val * prior[:, :, None, None]
    B, Fp, J, D = val.shape
    out = scatter_mm_reference(val.reshape(B, Fp, J * D), scatter_idx,
                               chunk_tiles, num_entities)
    return jnp.moveaxis(out.reshape(B, num_entities, J, D), 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gated_scatter_v3(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                     num_entities, apply_relu=True):
    """[B,Fp,D] PROJECTED fact values -> [B,J,E,D] aggregated neighbours."""
    return _fused_v3_fwd_impl(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                              num_entities, apply_relu)


def _v3_fwd(fact_rl, ins, prior, scatter_idx, chunk_tiles, num_entities,
            apply_relu):
    out = _fused_v3_fwd_impl(fact_rl, ins, prior, scatter_idx, chunk_tiles,
                             num_entities, apply_relu)
    return out, (fact_rl, ins, prior, scatter_idx, chunk_tiles)


def _v3_bwd(num_entities, apply_relu, res, g):
    fact_rl, ins, prior, scatter_idx, chunk_tiles = res
    if jax.default_backend() == "tpu":
        dfr, dins, dprior = _fused_v3_bwd_pallas_impl(
            fact_rl, ins, prior, scatter_idx, chunk_tiles, g, apply_relu)
        return dfr, dins, dprior, None, None
    B, Fp, D = fact_rl.shape
    J = ins.shape[1]
    pre = fact_rl[:, :, None, :] * ins[:, None, :, :]            # [B,Fp,J,D]
    act = jax.nn.relu(pre) if apply_relu else pre
    safe = jnp.maximum(scatter_idx, 0)
    g_flat = jnp.moveaxis(g, 1, 2).reshape(B, -1, J * D)         # [B,E,J*D]
    gb = jnp.take_along_axis(g_flat, safe[..., None], axis=1)
    gb = jnp.where((scatter_idx >= 0)[..., None], gb, 0.0)
    gb = gb.reshape(B, Fp, J, D)
    dprior = jnp.einsum("bfjd,bfjd->bf", gb, act)
    dval = gb * prior[:, :, None, None]
    if apply_relu:
        dval = jnp.where(pre > 0, dval, 0.0)
    dfr = jnp.einsum("bfjd,bjd->bfd", dval, ins)
    dins = jnp.einsum("bfjd,bfd->bjd", dval, fact_rl)
    return (dfr.astype(fact_rl.dtype), dins.astype(ins.dtype),
            dprior.astype(prior.dtype), None, None)


gated_scatter_v3.defvjp(_v3_fwd, _v3_bwd)


def gate_scatter_projected(fact_rl, ins, prior, direction, num_entities,
                           apply_relu=True):
    """Dispatch the v3 fused op (already-projected fact values): Mosaic
    kernel on TPU, XLA reference elsewhere."""
    if jax.default_backend() == "tpu":
        return gated_scatter_v3(fact_rl, ins, prior, direction.scatter,
                                direction.chunk_tiles, num_entities,
                                apply_relu)
    return gated_scatter_v3_reference(fact_rl, ins, prior, direction.scatter,
                                      direction.chunk_tiles, num_entities,
                                      apply_relu)


def gate_scatter(fact_rel, w, bias, ins, prior, direction, num_entities,
                 apply_relu=True):
    """Dispatch the fused op: Mosaic kernel on TPU, XLA reference elsewhere.

    direction: a data.kernel_layout.DirectionLayout (device arrays).
    """
    if jax.default_backend() == "tpu":
        return fused_gate_scatter_v2(
            fact_rel, w, bias, ins, prior, direction.scatter,
            direction.chunk_starts, direction.chunk_tiles, num_entities,
            apply_relu)
    return fused_gate_scatter_reference(
        fact_rel, w, bias, ins, prior, direction.scatter,
        direction.chunk_tiles, num_entities, apply_relu)


# --------------------------------------------------------------------------
# v4: both directions fused in ONE launch, whole-sample output resident in
# VMEM.
#
# v3's cost is per-grid-iteration overhead (BUILD_NOTES "kernel roofline":
# ~1.1us/chunk vs ~0.3us of MXU work) plus a [TILE_E, D] output-block
# writeback every time the entity tile changes. v4 restructures the grid so
# each (sample, chunk) iteration processes the fwd AND inv chunk (halving
# iterations per step), and the outputs are whole-sample [E, J*D] blocks
# whose index map depends only on the sample row — they stay VMEM-resident
# across all of a sample's chunks (one HBM writeback per sample instead of
# one per tile-change) and are accumulated into with a dynamic sublane
# slice at the chunk's entity tile. Lanes carry J*D (instructions packed
# j-major), so DMA rows are J*D wide instead of D — at D=50, J=2-3 this is
# the difference between 50/128 and 100-150/128(256) lane utilisation.
# --------------------------------------------------------------------------


def _fused_kernel_v4(ct2_ref, scatter_f_ref, prior_f_ref, vals_f_ref,
                     scatter_i_ref, prior_i_ref, vals_i_ref, ins_ref,
                     out_f_ref, out_i_ref, *, tile_e: int, tile_f: int,
                     num_ins: int, dim: int, apply_relu: bool,
                     k_per_cell: int = 1):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        out_f_ref[...] = jnp.zeros_like(out_f_ref)
        out_i_ref[...] = jnp.zeros_like(out_i_ref)

    dtype = vals_f_ref.dtype
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)

    for d, (scatter_ref, prior_ref, vals_ref, out_ref) in enumerate((
            (scatter_f_ref, prior_f_ref, vals_f_ref, out_f_ref),
            (scatter_i_ref, prior_i_ref, vals_i_ref, out_i_ref))):
        # k_per_cell chunks per grid iteration: the per-iteration fixed cost
        # (grid bookkeeping + block DMA setup, ~1.1us vs ~0.3us of MXU work
        # at D=50) amortises over K chunks
        for k in range(k_per_cell):
            cc = c * k_per_cell + k
            et = ct2_ref[b, d, cc]
            idx = scatter_ref[0, pl.ds(cc, 1), :]            # [1, TF]
            pri = prior_ref[0, pl.ds(cc, 1), :]              # [1, TF]
            onehot_pri = jnp.where((idx - et * tile_e) == rows,
                                   pri, 0.0).astype(dtype)   # [TE, TF]
            rl = vals_ref[0, k]                              # [TF, D]
            vals = []
            for j in range(num_ins):
                v = rl * ins_ref[0, pl.ds(j, 1), :]
                if apply_relu:
                    v = jnp.maximum(v, 0.0)
                vals.append(v)
            val_all = (jnp.concatenate(vals, axis=1) if num_ins > 1
                       else vals[0])
            contrib = jax.lax.dot_general(
                onehot_pri, val_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                         # [TE, J*D]
            cur = out_ref[0, pl.ds(et * tile_e, tile_e), :]
            out_ref[0, pl.ds(et * tile_e, tile_e), :] = (
                cur + contrib.astype(out_ref.dtype))


def _v4_bwd_dir_xla(vals, ins, prior, scatter_idx, g_dir, apply_relu):
    """Pure-XLA backward for one direction of the v4 op from the j-major
    [B, E, J*D] cotangent — last-resort path for entity counts beyond any
    resident-block budget (see _v4s_fits)."""
    B, Fp, D = vals.shape
    J = ins.shape[1]
    pre = vals[:, :, None, :] * ins[:, None, :, :]               # [B,Fp,J,D]
    act = jax.nn.relu(pre) if apply_relu else pre
    safe = jnp.maximum(scatter_idx, 0)
    gb = jnp.take_along_axis(g_dir, safe[..., None], axis=1)
    gb = jnp.where((scatter_idx >= 0)[..., None], gb, 0.0)
    gb = gb.reshape(B, Fp, J, D)
    dprior = jnp.einsum("bfjd,bfjd->bf", gb, act)
    dval = gb * prior[:, :, None, None]
    if apply_relu:
        dval = jnp.where(pre > 0, dval, 0.0)
    dfr = jnp.einsum("bfjd,bjd->bfd", dval, ins)
    dins = jnp.einsum("bfjd,bfd->bjd", dval, vals)
    return dfr, dprior, dins


def _v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i, scatter_f, scatter_i,
                 ct2, num_entities, apply_relu, interpret=False):
    # run the Mosaic kernel on TPU, the Pallas interpreter elsewhere, so the
    # custom-vjp op itself is callable on every backend (CI, virtual meshes)
    interpret = interpret or jax.default_backend() != "tpu"
    B, Fp, D = vals_f.shape
    J = ins.shape[1]
    NC = ct2.shape[2]
    if _v4_vmem_split(num_entities, J, D):
        if not _v4s_fits(num_entities, J, D):
            if J > 1 and _v4s_fits(num_entities, 1, D):
                # huge-E shapes (CWQ E=8192 bucket): even one direction's
                # full-J resident block overflows scoped VMEM — launch per
                # instruction (lanes = D) and concat j-major
                out_f = jnp.concatenate([
                    _v4s_call(vals_f, prior_f, scatter_f, ct2[:, 0],
                              num_entities, 1, D, apply_relu, interpret,
                              ins[:, j:j + 1]) for j in range(J)], axis=-1)
                out_i = jnp.concatenate([
                    _v4s_call(vals_i, prior_i, scatter_i, ct2[:, 1],
                              num_entities, 1, D, apply_relu, interpret,
                              ins[:, j:j + 1]) for j in range(J)], axis=-1)
                return out_f, out_i
            # beyond any resident-block budget: XLA reference semantics
            return gated_scatter_v4_reference(
                vals_f, vals_i, ins, prior_f, prior_i, scatter_f, scatter_i,
                ct2, num_entities, apply_relu)
        # big-E shapes: one launch per direction keeps the resident output
        # (x2 Mosaic buffers) under the scoped-VMEM limit
        out_f = _v4s_call(vals_f, prior_f, scatter_f, ct2[:, 0], num_entities,
                          J, D, apply_relu, interpret, ins)
        out_i = _v4s_call(vals_i, prior_i, scatter_i, ct2[:, 1], num_entities,
                          J, D, apply_relu, interpret, ins)
        return out_f, out_i
    tile_f = Fp // NC
    sh3 = (B, NC, tile_f)
    K = _pick_k(NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC // K),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, num_entities, J * D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, num_entities, J * D), lambda b, c, ct: (b, 0, 0)),
        ],
    )
    kernel = functools.partial(_fused_kernel_v4, tile_e=TILE_E, tile_f=tile_f,
                               num_ins=J, dim=D, apply_relu=apply_relu,
                               k_per_cell=K)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, num_entities, J * D), jnp.float32),
            jax.ShapeDtypeStruct((B, num_entities, J * D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Fp * J * TILE_E * D,
            bytes_accessed=(vals_f.size + vals_i.size) * vals_f.dtype.itemsize
            + 2 * B * num_entities * J * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(ct2, scatter_f.reshape(sh3), prior_f.reshape(sh3),
      vals_f.reshape(B, NC, tile_f, D), scatter_i.reshape(sh3),
      prior_i.reshape(sh3), vals_i.reshape(B, NC, tile_f, D), ins)


def _fused_bwd_kernel_v4(ct2_ref, scatter_f_ref, prior_f_ref, vals_f_ref,
                         scatter_i_ref, prior_i_ref, vals_i_ref, ins_ref,
                         g_f_ref, g_i_ref,
                         dvf_ref, dvi_ref, dpf_ref, dpi_ref, dins_ref, *,
                         tile_e: int, tile_f: int, num_ins: int, dim: int,
                         apply_relu: bool, k_per_cell: int = 1):
    """Backward of v4: per chunk, the output-grad gather is a one-hot matmul
    against the VMEM-resident whole-sample grad block (dynamic sublane
    slice) — no per-chunk HBM traffic for g."""
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        dins_ref[...] = jnp.zeros_like(dins_ref)

    precision = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    ones_row = jnp.ones((1, num_ins * dim), f32)

    for d, (scatter_ref, prior_ref, vals_ref, g_ref, dv_ref, dp_ref) in (
            enumerate(((scatter_f_ref, prior_f_ref, vals_f_ref, g_f_ref,
                        dvf_ref, dpf_ref),
                       (scatter_i_ref, prior_i_ref, vals_i_ref, g_i_ref,
                        dvi_ref, dpi_ref)))):
      for k in range(k_per_cell):
        cc = c * k_per_cell + k
        et = ct2_ref[b, d, cc]
        idx = scatter_ref[0, pl.ds(cc, 1), :]                # [1, TF]
        pri = prior_ref[0, pl.ds(cc, 1), :].astype(f32)      # [1, TF]
        onehot_t = ((idx - et * tile_e) == rows).astype(f32)  # [TE, TF]
        g_slice = g_ref[0, pl.ds(et * tile_e, tile_e), :].astype(f32)
        gb = jax.lax.dot_general(onehot_t, g_slice,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32,
                                 precision=precision)        # [TF, J*D]
        rl = vals_ref[0, k].astype(f32)                      # [TF, D]
        pres = []
        for j in range(num_ins):
            pres.append(rl * ins_ref[0, pl.ds(j, 1), :].astype(f32))
        pre_all = (jnp.concatenate(pres, axis=1) if num_ins > 1
                   else pres[0])                             # [TF, J*D]
        act_all = jnp.maximum(pre_all, 0.0) if apply_relu else pre_all
        # dprior[1, f] = sum_lanes gb * act  (lane reduction as a matmul)
        dp_row = jax.lax.dot_general(ones_row, gb * act_all,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32,
                                     precision=precision)    # [1, TF]
        dp_ref[0, pl.ds(cc, 1), :] = dp_row.astype(dp_ref.dtype)
        # each fact matches exactly one entity row: prior scaling commutes
        pri_col = jax.lax.dot_general(pri, jnp.ones((1, 1), f32),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=precision)   # [TF, 1]
        dval = gb * pri_col
        if apply_relu:
            dval = jnp.where(pre_all > 0, dval, 0.0)
        dfr = jnp.zeros((tile_f, dim), f32)
        for j in range(num_ins):
            dval_j = dval[:, j * dim:(j + 1) * dim]
            dfr += dval_j * ins_ref[0, pl.ds(j, 1), :].astype(f32)
            dins_ref[0, pl.ds(j, 1), :] += jnp.sum(
                dval_j * rl, axis=0, keepdims=True).astype(dins_ref.dtype)
        dv_ref[0, k] = dfr.astype(dv_ref.dtype)


def _v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, scatter_f, scatter_i,
                 ct2, g_f, g_i, apply_relu, interpret=False):
    B, Fp, D = vals_f.shape
    J = ins.shape[1]
    NC = ct2.shape[2]
    if _v4_vmem_split(g_f.shape[1], J, D):
        E = g_f.shape[1]
        if not _v4s_fits(E, J, D):
            if J > 1 and _v4s_fits(E, 1, D):
                # per-instruction launches (see _v4s_fits): each j's grads
                # for vals/prior sum, the per-j dins rows concatenate
                outs = []
                for vals, prior, scatter, d, gd in (
                        (vals_f, prior_f, scatter_f, 0, g_f),
                        (vals_i, prior_i, scatter_i, 1, g_i)):
                    dv, dp, dins_parts = None, None, []
                    for j in range(J):
                        dvj, dpj, dij = _v4s_bwd_call(
                            vals, prior, scatter, ct2[:, d],
                            gd[:, :, j * D:(j + 1) * D], 1, D, apply_relu,
                            interpret, ins[:, j:j + 1])
                        dv = dvj if dv is None else dv + dvj
                        dp = dpj if dp is None else dp + dpj
                        dins_parts.append(dij)
                    outs.append((dv, dp,
                                 jnp.concatenate(dins_parts, axis=1)))
                (dvf, dpf, dins_f), (dvi, dpi, dins_i) = outs
            else:
                (dvf, dpf, dins_f) = _v4_bwd_dir_xla(
                    vals_f, ins, prior_f, scatter_f, g_f, apply_relu)
                (dvi, dpi, dins_i) = _v4_bwd_dir_xla(
                    vals_i, ins, prior_i, scatter_i, g_i, apply_relu)
            return (dvf.astype(vals_f.dtype), dvi.astype(vals_i.dtype),
                    (dins_f + dins_i).astype(ins.dtype),
                    dpf.astype(prior_f.dtype), dpi.astype(prior_i.dtype))
        dvf, dpf, dins_f = _v4s_bwd_call(vals_f, prior_f, scatter_f,
                                         ct2[:, 0], g_f, J, D, apply_relu,
                                         interpret, ins)
        dvi, dpi, dins_i = _v4s_bwd_call(vals_i, prior_i, scatter_i,
                                         ct2[:, 1], g_i, J, D, apply_relu,
                                         interpret, ins)
        return (dvf.astype(vals_f.dtype), dvi.astype(vals_i.dtype),
                (dins_f + dins_i).astype(ins.dtype),
                dpf.astype(prior_f.dtype), dpi.astype(prior_i.dtype))
    tile_f = Fp // NC
    sh3 = (B, NC, tile_f)
    E = g_f.shape[1]
    K = _pick_k(NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC // K),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, E, J * D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, E, J * D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
    )
    kernel = functools.partial(_fused_bwd_kernel_v4, tile_e=TILE_E,
                               tile_f=tile_f, num_ins=J, dim=D,
                               apply_relu=apply_relu, k_per_cell=K)
    dvf4, dvi4, dpf3, dpi3, dins = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NC, tile_f, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, tile_f, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, tile_f), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, tile_f), jnp.float32),
            jax.ShapeDtypeStruct((B, J, D), jnp.float32),
        ],
        interpret=interpret,
    )(ct2, scatter_f.reshape(sh3), prior_f.reshape(sh3),
      vals_f.reshape(B, NC, tile_f, D), scatter_i.reshape(sh3),
      prior_i.reshape(sh3), vals_i.reshape(B, NC, tile_f, D), ins, g_f, g_i)
    return (dvf4.reshape(B, Fp, D).astype(vals_f.dtype),
            dvi4.reshape(B, Fp, D).astype(vals_i.dtype),
            dins.astype(ins.dtype),
            dpf3.reshape(B, Fp).astype(prior_f.dtype),
            dpi3.reshape(B, Fp).astype(prior_i.dtype))


def gated_scatter_v4_reference(vals_f, vals_i, ins, prior_f, prior_i,
                               scatter_f, scatter_i, ct2, num_entities,
                               apply_relu=True):
    """XLA fallback with identical semantics: two direction outputs, each
    [B, E, J*D] with instructions packed j-major in the lane dim."""
    outs = []
    for vals, prior, scatter in ((vals_f, prior_f, scatter_f),
                                 (vals_i, prior_i, scatter_i)):
        o = gated_scatter_v3_reference(vals, ins, prior, scatter, None,
                                       num_entities, apply_relu)
        B, J, E, D = o.shape
        outs.append(jnp.moveaxis(o, 1, 2).reshape(B, E, J * D))
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def gated_scatter_v4(vals_f, vals_i, ins, prior_f, prior_i, scatter_f,
                     scatter_i, ct2, num_entities, apply_relu=True):
    """Fused both-direction gate+scatter over PROJECTED fact values.
    Returns (out_fwd, out_inv), each [B, E, J*D] (j-major lanes)."""
    return _v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i, scatter_f,
                        scatter_i, ct2, num_entities, apply_relu)


def _v4_fwd(vals_f, vals_i, ins, prior_f, prior_i, scatter_f, scatter_i,
            ct2, num_entities, apply_relu):
    out = _v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i, scatter_f,
                       scatter_i, ct2, num_entities, apply_relu)
    return out, (vals_f, vals_i, ins, prior_f, prior_i, scatter_f,
                 scatter_i, ct2)


def _v4_bwd(num_entities, apply_relu, res, g):
    vals_f, vals_i, ins, prior_f, prior_i, scatter_f, scatter_i, ct2 = res
    g_f, g_i = g
    if jax.default_backend() == "tpu":
        return _v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, scatter_f,
                            scatter_i, ct2, g_f, g_i, apply_relu) + (None,
                                                                     None,
                                                                     None)
    # XLA fallback: run the v3 backward per direction on the [B,J,E,D] view
    B, E, JD = g_f.shape
    J = ins.shape[1]
    D = JD // J
    dins = jnp.zeros_like(ins)
    grads = []
    for vals, prior, scatter, gd in ((vals_f, prior_f, scatter_f, g_f),
                                     (vals_i, prior_i, scatter_i, g_i)):
        g4 = jnp.moveaxis(gd.reshape(B, E, J, D), 2, 1)      # [B, J, E, D]
        dfr, di, dpri = _v3_bwd(num_entities, apply_relu,
                                (vals, ins, prior, scatter, None), g4)[:3]
        dins = dins + di
        grads.append((dfr, dpri))
    (dvf, dpf), (dvi, dpi) = grads
    return dvf, dvi, dins, dpf, dpi, None, None, None


gated_scatter_v4.defvjp(_v4_fwd, _v4_bwd)


def gate_scatter_both(fact_rl_f, fact_rl_i, ins, prior_f, prior_i, layout,
                      num_entities, apply_relu=True):
    """Dispatch the v4 fused both-direction op (already-projected values):
    Mosaic kernel on TPU, XLA reference elsewhere. Returns (out_f, out_i)
    as [B, E, J*D]."""
    ct2 = jnp.stack([layout.fwd.chunk_tiles, layout.inv.chunk_tiles], axis=1)
    if jax.default_backend() == "tpu":
        return gated_scatter_v4(fact_rl_f, fact_rl_i, ins, prior_f, prior_i,
                                layout.fwd.scatter, layout.inv.scatter, ct2,
                                num_entities, apply_relu)
    return gated_scatter_v4_reference(fact_rl_f, fact_rl_i, ins, prior_f,
                                      prior_i, layout.fwd.scatter,
                                      layout.inv.scatter, ct2, num_entities,
                                      apply_relu)


# Single-direction v4 ("v4s"): same resident-output design, one direction
# per launch. Used when BOTH directions' resident [E, J*D] blocks (double-
# buffered by Mosaic across the sample transition) would exceed scoped VMEM
# — e.g. CWQ shapes E=4096, J=3: 2 dirs x 2 buffers x 4096x256x4B = 16.8MB.


def _fused_kernel_v4s(ct_ref, scatter_ref, prior_ref, vals_ref, ins_ref,
                      out_ref, *, tile_e: int, tile_f: int, num_ins: int,
                      dim: int, apply_relu: bool, k_per_cell: int = 1):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    dtype = vals_ref.dtype
    precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    for k in range(k_per_cell):
        cc = c * k_per_cell + k
        et = ct_ref[b, cc]
        idx = scatter_ref[0, pl.ds(cc, 1), :]
        pri = prior_ref[0, pl.ds(cc, 1), :]
        onehot_pri = jnp.where((idx - et * tile_e) == rows, pri,
                               0.0).astype(dtype)
        rl = vals_ref[0, k]
        vals = []
        for j in range(num_ins):
            v = rl * ins_ref[0, pl.ds(j, 1), :]
            if apply_relu:
                v = jnp.maximum(v, 0.0)
            vals.append(v)
        val_all = jnp.concatenate(vals, axis=1) if num_ins > 1 else vals[0]
        contrib = jax.lax.dot_general(
            onehot_pri, val_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        cur = out_ref[0, pl.ds(et * tile_e, tile_e), :]
        out_ref[0, pl.ds(et * tile_e, tile_e), :] = (
            cur + contrib.astype(out_ref.dtype))


def _fused_bwd_kernel_v4s(ct_ref, scatter_ref, prior_ref, vals_ref, ins_ref,
                          g_ref, dv_ref, dp_ref, dins_ref, *, tile_e: int,
                          tile_f: int, num_ins: int, dim: int,
                          apply_relu: bool, k_per_cell: int = 1):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        dins_ref[...] = jnp.zeros_like(dins_ref)

    precision = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_f), 0)
    ones_row = jnp.ones((1, num_ins * dim), f32)
    for k in range(k_per_cell):
        cc = c * k_per_cell + k
        et = ct_ref[b, cc]
        idx = scatter_ref[0, pl.ds(cc, 1), :]
        pri = prior_ref[0, pl.ds(cc, 1), :].astype(f32)
        onehot_t = ((idx - et * tile_e) == rows).astype(f32)
        g_slice = g_ref[0, pl.ds(et * tile_e, tile_e), :].astype(f32)
        gb = jax.lax.dot_general(onehot_t, g_slice, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32,
                                 precision=precision)
        rl = vals_ref[0, k].astype(f32)
        pres = [rl * ins_ref[0, pl.ds(j, 1), :].astype(f32)
                for j in range(num_ins)]
        pre_all = jnp.concatenate(pres, axis=1) if num_ins > 1 else pres[0]
        act_all = jnp.maximum(pre_all, 0.0) if apply_relu else pre_all
        dp_row = jax.lax.dot_general(ones_row, gb * act_all,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32,
                                     precision=precision)
        dp_ref[0, pl.ds(cc, 1), :] = dp_row.astype(dp_ref.dtype)
        pri_col = jax.lax.dot_general(pri, jnp.ones((1, 1), f32),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=precision)
        dval = gb * pri_col
        if apply_relu:
            dval = jnp.where(pre_all > 0, dval, 0.0)
        dfr = jnp.zeros((tile_f, dim), f32)
        for j in range(num_ins):
            dval_j = dval[:, j * dim:(j + 1) * dim]
            dfr += dval_j * ins_ref[0, pl.ds(j, 1), :].astype(f32)
            dins_ref[0, pl.ds(j, 1), :] += jnp.sum(
                dval_j * rl, axis=0, keepdims=True).astype(dins_ref.dtype)
        dv_ref[0, k] = dfr.astype(dv_ref.dtype)


def _pick_k(num_chunks: int) -> int:
    """Chunks per grid cell: the largest divisor of NC up to the cap
    (env GNN_RAG_V4_K). Fewer, fatter grid iterations amortise the
    per-iteration fixed cost that dominates this op at D=50. Default 8:
    the on-chip sweep (docs/kernel_k_sweep_r04.json) measured K=8 fastest
    at both WebQSP-B16 (op fwd+bwd 4.44->3.67 ms, train step -8%) and
    CWQ-B8 (5.87->4.19 ms, train -6%) shapes."""
    cap = int(os.environ.get("GNN_RAG_V4_K", "8"))
    k = 1
    for cand in (2, 4, 8, 16):
        if cand <= cap and num_chunks % cand == 0:
            k = cand
    return k


def _v4_vmem_split(num_entities: int, J: int, D: int) -> bool:
    """True when the dual-direction launch would blow scoped VMEM: Mosaic
    double-buffers the resident output blocks across the sample transition,
    so the budget is 2 dirs x 2 buffers x E x roundup(J*D, 128 lanes) x 4B
    (plus ~1MB of chunk blocks) against the 16MB scoped limit."""
    lanes = -(-J * D // 128) * 128
    limit_mb = float(os.environ.get("GNN_RAG_V4_VMEM_LIMIT_MB", "14"))
    return 4 * num_entities * lanes * 4 > limit_mb * 2**20


def _v4s_fits(num_entities: int, J: int, D: int) -> bool:
    """True when ONE direction's resident [E, roundup(J*D,128)] output block
    (x2 Mosaic buffers) fits under the scoped-VMEM limit. When it doesn't
    (e.g. the CWQ E=8192 bucket at J=3: 2 x 8192 x 256 x 4B = 16.8MB), the
    launch is split per instruction (J=1 lanes -> 8.4MB) and the j-major
    outputs concatenated — numerics are unchanged because each instruction's
    one-hot matmul is independent of the others."""
    lanes = -(-J * D // 128) * 128
    limit_mb = float(os.environ.get("GNN_RAG_V4_VMEM_LIMIT_MB", "14"))
    return 2 * num_entities * lanes * 4 <= limit_mb * 2**20


def _v4s_call(vals, prior, scatter, ct, num_entities, J, D, apply_relu,
              interpret, ins):
    B, Fp, _ = vals.shape
    NC = ct.shape[1]
    tile_f = Fp // NC
    sh3 = (B, NC, tile_f)
    K = _pick_k(NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC // K),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, num_entities, J * D),
                               lambda b, c, ct: (b, 0, 0)),
    )
    kernel = functools.partial(_fused_kernel_v4s, tile_e=TILE_E,
                               tile_f=tile_f, num_ins=J, dim=D,
                               apply_relu=apply_relu, k_per_cell=K)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_entities, J * D),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Fp * J * TILE_E * D,
            bytes_accessed=vals.size * vals.dtype.itemsize
            + B * num_entities * J * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(ct, scatter.reshape(sh3), prior.reshape(sh3),
      vals.reshape(B, NC, tile_f, D), ins)


def _v4s_bwd_call(vals, prior, scatter, ct, g, J, D, apply_relu, interpret,
                  ins):
    B, Fp, _ = vals.shape
    NC = ct.shape[1]
    tile_f = Fp // NC
    sh3 = (B, NC, tile_f)
    E = g.shape[1]
    K = _pick_k(NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC // K),
        in_specs=[
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, E, J * D), lambda b, c, ct: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, tile_f, D), lambda b, c, ct: (b, c, 0, 0)),
            pl.BlockSpec((1, NC, tile_f), lambda b, c, ct: (b, 0, 0)),
            pl.BlockSpec((1, J, D), lambda b, c, ct: (b, 0, 0)),
        ],
    )
    kernel = functools.partial(_fused_bwd_kernel_v4s, tile_e=TILE_E,
                               tile_f=tile_f, num_ins=J, dim=D,
                               apply_relu=apply_relu, k_per_cell=K)
    dv4, dp3, dins = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NC, tile_f, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, tile_f), jnp.float32),
            jax.ShapeDtypeStruct((B, J, D), jnp.float32),
        ],
        interpret=interpret,
    )(ct, scatter.reshape(sh3), prior.reshape(sh3),
      vals.reshape(B, NC, tile_f, D), ins, g)
    return dv4.reshape(B, Fp, D), dp3.reshape(B, Fp), dins
