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
        return jnp.take_along_axis(ent_values, index, axis=1)
    B, F = index.shape
    D = ent_values.shape[-1]
    return jnp.take_along_axis(ent_values, index[..., None], axis=1)


def batched_segment_sum(values: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Per-row scatter-add: out[b, index[b, f]] += values[b, f].

    values: [B, F] or [B, F, D]; index: int32 [B, F]; -> [B, num_segments(, D)].
    Implemented as one flattened segment_sum (ids = b * num_segments + idx),
    the same linearisation the reference uses for its block-diagonal batch
    sparse matrices (dataset_load.py:483 ``index_bias = i * max_local_entity``).
    """
    B, F = index.shape
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
