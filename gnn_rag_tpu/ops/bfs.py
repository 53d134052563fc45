"""Batched BFS levels on device.

The north-star op (BASELINE.json): shortest-path extraction from question
entities to predicted answers, replacing the reference's per-question
networkx.all_shortest_paths host loop (llm/src/utils/graph_utils.py:49-75).

Device side computes, for every (sample, source) pair at once, the BFS level
of every node via masked frontier expansion over the padded undirected edge
list — `max_hops` fused gather/scatter rounds under one jit. Path
enumeration (output-bound, tiny) stays on the host: a node u precedes v on a
shortest path iff dist[u] == dist[v] - 1 and (u, v) is an edge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .segment import batched_segment_sum

UNREACHED = jnp.int32(2**30)


@functools.partial(jax.jit, static_argnames=("num_entities", "max_hops"))
def bfs_levels(heads: jnp.ndarray, tails: jnp.ndarray, fact_mask: jnp.ndarray,
               src_onehot: jnp.ndarray, *, num_entities: int,
               max_hops: int | None = None) -> jnp.ndarray:
    """heads/tails: int32 [B, F] (already symmetrised for undirected graphs);
    fact_mask: [B, F]; src_onehot: [B, S, E] one-hot source sets.
    Returns dist int32 [B, S, E] with UNREACHED where not reachable.

    With ``max_hops=None`` (default) the frontier expansion runs UNBOUNDED
    inside a ``lax.while_loop`` until no new node is reached (matching the
    reference's unbounded nx shortest paths, graph_utils.py:49-75) — the
    iteration count is data-dependent but the shapes are static, so there is
    exactly one compilation either way."""
    B, S, E = src_onehot.shape
    reach = src_onehot > 0                                    # [B, S, E]
    dist = jnp.where(reach, 0, UNREACHED).astype(jnp.int32)

    heads_b = jnp.broadcast_to(heads[:, None, :], (B, S, heads.shape[1]))
    tails_b = jnp.broadcast_to(tails[:, None, :], (B, S, tails.shape[1]))
    mask_b = jnp.broadcast_to(fact_mask[:, None, :], heads_b.shape)

    def flat(x):
        return x.reshape(B * S, -1)

    h_f, t_f, m_f = flat(heads_b), flat(tails_b), flat(mask_b)
    bound = max_hops if max_hops is not None else E  # diameter <= E - 1

    def cond(carry):
        _, _, hop, changed = carry
        return jnp.logical_and(hop < bound, changed)

    def body(carry):
        reach, dist, hop, _ = carry
        r = reach.reshape(B * S, E)
        # frontier values at edge sources -> accumulate at edge targets
        at_src = jnp.take_along_axis(r.astype(jnp.float32), h_f, axis=1) * m_f
        hit = batched_segment_sum(at_src, t_f, E) > 0
        new = hit & ~r
        r = r | hit
        d = jnp.where(new, hop + 1, dist.reshape(B * S, E))
        return (r.reshape(B, S, E), d.reshape(B, S, E), hop + 1,
                jnp.any(new))

    reach, dist, _, _ = jax.lax.while_loop(
        cond, body, (reach, dist, jnp.int32(0), jnp.bool_(True)))
    return dist
