"""On-device degree normalisation weights.

The reference computes 1/out-degree(head) per fact on the host on EVERY batch
(dataset_load.py:509-511). Here it is a segment-sum + gather on device, after
fact dropout, so it stays exact under dropout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .segment import batched_segment_sum, gather_entities_to_facts


def head_degree_weight(heads: jnp.ndarray, fact_mask: jnp.ndarray,
                       num_entities: int) -> jnp.ndarray:
    """[B, F] weights = 1 / (#kept facts sharing this head in this sample)."""
    counts = batched_segment_sum(fact_mask, heads, num_entities)  # [B, E]
    per_fact = gather_entities_to_facts(counts, heads)            # [B, F]
    return jnp.where(per_fact > 0, 1.0 / jnp.maximum(per_fact, 1.0), 0.0) * fact_mask
