"""Batched gather/scatter message-passing primitives (XLA baseline).

These express the reference's per-batch ``torch.sparse.mm`` products
(base_gnn.py:45-54, reasongnn.py:80-111, layer_init.py:53-57) as static-shape
gather + segment-sum over the padded COO arrays of a GraphBatch:

* ``head2fact_mat @ dist``  ->  gather: ``dist[b, heads[b, f]]``
* ``fact2tail_mat @ vals``  ->  scatter-add of fact values into tail slots

The scatter is a flattened ``jax.ops.segment_sum`` (one XLA scatter-add per
call). ``ops.pallas_mp`` provides the fused MXU kernel for the same contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_entities_to_facts(ent_values: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """ent_values: [B, E] or [B, E, D]; index: int32 [B, F] -> [B, F(, D)].

    Equivalent of ``sparse.mm(head2fact_mat, dist)`` (reasongnn.py:80) when
    ``index = heads`` (values at padded facts are garbage; callers multiply by
    fact_mask).
    """
    if ent_values.ndim == 2:
        # MXU one-hot decomposition when E is tile-aligned (mxu_gather);
        # XLA's element gather is a serial loop on TPU
        return mxu_gather(ent_values, index)
    B, F = index.shape
    D = ent_values.shape[-1]
    return jnp.take_along_axis(ent_values, index[..., None], axis=1)


def mxu_gather(values: jnp.ndarray, index: jnp.ndarray,
               tile: int = 128) -> jnp.ndarray:
    """``take_along_axis(values, index, axis=1)`` as two one-hot einsums.

    XLA lowers a [B, F] element-gather from [B, E] to a SERIAL per-element
    loop on TPU (~10ns/element: 1.67 ms for 160k elements, 26% of the whole
    WebQSP-B16 ReaRev train step, docs/kernel_floor_r05.json ablation).
    Decomposing the index into (tile-id, offset) turns it into two tiny
    one-hot contractions the MXU eats, and autodiff turns the backward into
    the same matmuls (killing the equally-serial scatter-add transpose):

        values2[b, t, r]  = values[b, t*tile + r]
        d1[b, f, r]       = sum_t values2[b, t, r] * 1[index//tile == t]
        out[b, f]         = sum_r d1[b, f, r]      * 1[index%tile  == r]

    E must divide by ``tile`` (loader buckets are 128-multiples). Exactness:
    one-hot entries are exact in every dtype; f32 values keep f32 precision
    through HIGHEST-precision dots.
    """
    B, E = values.shape
    if E % tile:
        return jnp.take_along_axis(values, index, axis=1)
    nt = E // tile
    prec = (jax.lax.Precision.HIGHEST if values.dtype == jnp.float32
            else None)
    v2 = values.reshape(B, nt, tile)
    t_oh = jax.nn.one_hot(index // tile, nt, dtype=values.dtype)  # [B,F,NT]
    d1 = jnp.einsum("bnr,bfn->bfr", v2, t_oh, precision=prec)     # [B,F,TE]
    r_oh = jax.nn.one_hot(index % tile, tile, dtype=values.dtype)
    return jnp.einsum("bfr,bfr->bf", d1, r_oh, precision=prec)


def batched_segment_sum(values: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Per-row scatter-add: out[b, index[b, f]] += values[b, f].

    values: [B, F] or [B, F, D]; index: int32 [B, F]; -> [B, num_segments(, D)].
    Implemented as one flattened segment_sum (ids = b * num_segments + idx),
    the same linearisation the reference uses for its block-diagonal batch
    sparse matrices (dataset_load.py:483 ``index_bias = i * max_local_entity``).
    """
    B, F = index.shape
    if values.ndim == 2 and num_segments % 128 == 0:
        # MXU one-hot transpose of mxu_gather: XLA's scatter-add is the same
        # serial per-element loop as its gather (kernel_floor_r05 ablation)
        tile, nt = 128, num_segments // 128
        prec = (jax.lax.Precision.HIGHEST if values.dtype == jnp.float32
                else None)
        r_oh = jax.nn.one_hot(index % tile, tile, dtype=values.dtype)
        t_oh = jax.nn.one_hot(index // tile, nt, dtype=values.dtype)
        d1 = r_oh * values[..., None]                           # [B,F,TE]
        out2 = jnp.einsum("bfr,bfn->bnr", d1, t_oh, precision=prec)
        return out2.reshape(B, num_segments)
    offsets = (jnp.arange(B, dtype=index.dtype) * num_segments)[:, None]
    flat_ids = (index + offsets).reshape(B * F)
    flat_vals = values.reshape((B * F,) + values.shape[2:])
    out = jax.ops.segment_sum(flat_vals, flat_ids, num_segments=B * num_segments)
    return out.reshape((B, num_segments) + values.shape[2:])


def layout_fact_keep(direction, keep: jnp.ndarray) -> jnp.ndarray:
    """Gather a canonical per-fact mask ``keep [B, F]`` (e.g. fact-dropout
    keeps sampled in COO order) onto a DirectionLayout's tile-sorted slots
    ``[B, Fp]`` via its ``perm`` map. Pad slots (perm == -1) return 0."""
    perm = direction.perm
    k = jnp.take_along_axis(keep, jnp.maximum(perm, 0), axis=1)
    return k * (perm >= 0).astype(keep.dtype)


def scatter_facts_to_entities(fact_values: jnp.ndarray, index: jnp.ndarray,
                              num_entities: int,
                              fact_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Equivalent of ``sparse.mm(fact2tail_mat, fact_val)`` (reasongnn.py:84)
    when ``index = tails``. Padded facts must carry zero values: pass
    fact_mask (or pre-zero them)."""
    if fact_mask is not None:
        fact_values = fact_values * (fact_mask[..., None] if fact_values.ndim == 3
                                     else fact_mask)
    return batched_segment_sum(fact_values, index, num_entities)
