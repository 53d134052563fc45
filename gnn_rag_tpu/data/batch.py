"""GraphBatch — the framework's central datatype.

A batch of question-specific KG subgraphs in *padded COO* layout, resident on
device. This replaces the reference's per-batch host-rebuilt torch.sparse
matrices (reference: gnn/dataset_load.py:473-527 and
gnn/modules/kg_reasoning/base_gnn.py:19-51, rebuilt on every train step).
Here the structure arrays are built once per question at ingest, padded to a
shape bucket, and all message passing is expressed as static-shape
gather/scatter over them — so XLA compiles the whole train step once per
bucket shape.

Layout (B = batch, E = padded local entities, F = padded facts, L = question
tokens):

* ``heads/rels/tails[B, F]`` — COO triples in *local* entity ids. Padded fact
  slots carry ``heads=tails=0`` and ``fact_mask=0`` so they contribute nothing
  to scatters.
* ``entity_gids[B, E]`` — global entity id per local slot, ``num_entity`` for
  padding. Mirrors ``candidate_entities`` (dataset_load.py:75) including the
  WebQSP quirk that question entities are masked out of the candidate set
  (dataset_load.py:249-257): their slot also holds ``num_entity``.
* ``ent_present[B, E]`` — 1.0 where a real local entity exists (seed slots
  included), used for structural ops (self loops, BFS); ``candidate_mask`` is
  what the softmax scoring uses (= entity_gids != num_entity, the reference's
  ``local_entity_mask``, reasongnn.py:48).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GraphBatch:
    # structure (COO, local ids)
    heads: jnp.ndarray          # int32 [B, F]
    rels: jnp.ndarray           # int32 [B, F]
    tails: jnp.ndarray          # int32 [B, F]
    fact_mask: jnp.ndarray      # float32 [B, F]
    # entities
    entity_gids: jnp.ndarray    # int32 [B, E]  (num_entity == padding / masked seed)
    ent_present: jnp.ndarray    # float32 [B, E]
    # distributions
    seed_dist: jnp.ndarray      # float32 [B, E]
    query_entities: jnp.ndarray # float32 [B, E]
    answer_dist: jnp.ndarray    # float32 [B, E]
    # question text
    q_tokens: jnp.ndarray       # int32 [B, L]
    q_mask: jnp.ndarray         # float32 [B, L]
    # optional precomputed frozen-LM hidden states for the question
    q_hidden: Optional[jnp.ndarray] = None   # float32 [B, L, word_dim]
    # optional degree-normalisation weights (reference: dataset_load.py:509-517)
    fact_weight: Optional[jnp.ndarray] = None      # float32 [B, F]  1/out-degree(head)
    fact_rel_weight: Optional[jnp.ndarray] = None  # float32 [B, F]  1/count(head, rel)
    # optional tile-sorted layout for the Pallas kernels (data.kernel_layout)
    layout: Optional[object] = None                # KernelLayout pytree

    @property
    def batch_size(self) -> int:
        return self.heads.shape[0]

    @property
    def max_entities(self) -> int:
        return self.entity_gids.shape[1]

    @property
    def max_facts(self) -> int:
        return self.heads.shape[1]

    def candidate_mask(self, num_entity: int) -> jnp.ndarray:
        """Softmax support mask == reference local_entity_mask (reasongnn.py:48)."""
        return (self.entity_gids != num_entity).astype(jnp.float32)


def pad_to(x: np.ndarray, size: int, axis: int, fill=0) -> np.ndarray:
    """Pad `x` along `axis` up to `size` with `fill`."""
    cur = x.shape[axis]
    if cur == size:
        return x
    if cur > size:
        raise ValueError(f"cannot pad axis {axis} of size {cur} down to {size}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - cur)
    return np.pad(x, widths, constant_values=fill)


DEFAULT_ENTITY_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)
DEFAULT_FACT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536,
                        131072)


def bucketize(n: int, buckets) -> int:
    """Smallest bucket >= n; if none fits (or no buckets), round up to a
    multiple of 128 (TPU lane width). Coarse bucket ladders bound the number
    of XLA compilations (one per distinct batch shape)."""
    for b in buckets:
        if n <= b:
            return int(b)
    return int(-(-n // 128) * 128) if n > 0 else 128
