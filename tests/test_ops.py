"""Unit tests: gather/scatter primitives vs dense numpy references."""

import numpy as np
import jax.numpy as jnp

from gnn_rag_tpu.ops import (batched_segment_sum, gather_entities_to_facts,
                             head_degree_weight, masked_softmax,
                             scatter_facts_to_entities)


def test_gather_2d():
    rng = np.random.default_rng(0)
    dist = rng.standard_normal((3, 7)).astype(np.float32)
    idx = rng.integers(0, 7, size=(3, 11)).astype(np.int32)
    out = np.asarray(gather_entities_to_facts(jnp.asarray(dist), jnp.asarray(idx)))
    expect = np.take_along_axis(dist, idx, axis=1)
    np.testing.assert_allclose(out, expect)


def test_gather_3d():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((2, 5, 4)).astype(np.float32)
    idx = rng.integers(0, 5, size=(2, 9)).astype(np.int32)
    out = np.asarray(gather_entities_to_facts(jnp.asarray(emb), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], emb[b, idx[b]])


def test_batched_segment_sum_matches_dense():
    rng = np.random.default_rng(2)
    B, F, E, D = 3, 20, 6, 5
    vals = rng.standard_normal((B, F, D)).astype(np.float32)
    idx = rng.integers(0, E, size=(B, F)).astype(np.int32)
    out = np.asarray(batched_segment_sum(jnp.asarray(vals), jnp.asarray(idx), E))
    expect = np.zeros((B, E, D), np.float32)
    for b in range(B):
        for f in range(F):
            expect[b, idx[b, f]] += vals[b, f]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_scatter_respects_fact_mask():
    rng = np.random.default_rng(3)
    B, F, E, D = 2, 10, 4, 3
    vals = rng.standard_normal((B, F, D)).astype(np.float32)
    idx = rng.integers(0, E, size=(B, F)).astype(np.int32)
    mask = (rng.random((B, F)) > 0.5).astype(np.float32)
    out = np.asarray(scatter_facts_to_entities(
        jnp.asarray(vals), jnp.asarray(idx), E, jnp.asarray(mask)))
    expect = np.zeros((B, E, D), np.float32)
    for b in range(B):
        for f in range(F):
            expect[b, idx[b, f]] += vals[b, f] * mask[b, f]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_masked_softmax_support():
    scores = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0, 1.0]])
    out = np.asarray(masked_softmax(scores, mask))
    assert out[0, 2] < 1e-12
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)


def test_head_degree_weight():
    heads = jnp.asarray([[0, 0, 1, 2, 2, 2]], dtype=jnp.int32)
    mask = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.0, 0.0]])
    w = np.asarray(head_degree_weight(heads, mask, 4))
    np.testing.assert_allclose(w[0], [0.5, 0.5, 1.0, 0.5, 0.5, 0.0])


def test_mxu_gather_tile_aligned_exact():
    # E % 128 == 0 takes the one-hot MXU einsum path (ops/segment.mxu_gather);
    # it must be bit-exact vs take_along_axis in f32 (HIGHEST dots) and
    # value-exact in bf16 (one-hot entries are exact in every dtype)
    from gnn_rag_tpu.ops.segment import mxu_gather
    rng = np.random.default_rng(4)
    B, E, F = 4, 256, 333
    idx = rng.integers(0, E, size=(B, F)).astype(np.int32)
    for dtype in (np.float32, jnp.bfloat16):
        vals = jnp.asarray(rng.standard_normal((B, E))).astype(dtype)
        out = np.asarray(mxu_gather(vals, jnp.asarray(idx)), np.float32)
        expect = np.take_along_axis(np.asarray(vals, np.float32), idx, axis=1)
        np.testing.assert_array_equal(out, expect)


def test_segment_sum_2d_mxu_branch_exact():
    # num_segments % 128 == 0 and 2-D values takes the transposed one-hot
    # MXU branch in batched_segment_sum; exact vs the scatter-add reference
    rng = np.random.default_rng(5)
    B, F, E = 3, 500, 384
    vals = rng.standard_normal((B, F)).astype(np.float32)
    idx = rng.integers(0, E, size=(B, F)).astype(np.int32)
    out = np.asarray(batched_segment_sum(jnp.asarray(vals), jnp.asarray(idx), E))
    expect = np.zeros((B, E), np.float32)
    for b in range(B):
        np.add.at(expect[b], idx[b], vals[b])
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


def test_mxu_gather_grad_is_exact_scatter():
    # autodiff of mxu_gather must produce the exact scatter-add transpose
    import jax
    from gnn_rag_tpu.ops.segment import mxu_gather
    rng = np.random.default_rng(6)
    B, E, F = 2, 128, 77
    vals = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, size=(B, F)).astype(np.int32))
    ct = rng.standard_normal((B, F)).astype(np.float32)

    g_mxu = jax.grad(lambda v: jnp.sum(mxu_gather(v, idx) * ct))(vals)
    g_ref = jax.grad(lambda v: jnp.sum(
        jnp.take_along_axis(v, idx, axis=1) * ct))(vals)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
