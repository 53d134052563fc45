"""Pallas tiled-scatter kernel vs segment-sum reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_rag_tpu.data.kernel_layout import (TILE_E, TILE_F,
                                            build_kernel_layout)
from gnn_rag_tpu.ops import pallas_mp
from gnn_rag_tpu.ops.segment import batched_segment_sum


@pytest.fixture(scope="module")
def layout_case():
    rng = np.random.default_rng(0)
    B, F, E, C = 2, 300, 256, 8
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = rng.integers(0, 10, (B, F)).astype(np.int32)
    mask = (rng.random((B, F)) > 0.2).astype(np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=10)
    return kl, heads, tails, rels, mask, E


def test_layout_roundtrip(layout_case):
    """Sorted layout preserves exactly the valid (scatter, gather, rel) triples."""
    kl, heads, tails, rels, mask, E = layout_case
    for b in range(heads.shape[0]):
        orig = sorted((t, h, r) for t, h, r, m in
                      zip(tails[b], heads[b], rels[b], mask[b]) if m > 0)
        got = sorted((s, g, r) for s, g, r in
                     zip(kl.fwd.scatter[b], kl.fwd.gather[b], kl.fwd.rels[b])
                     if s >= 0)
        assert orig == got
        # chunk constraint: every fact in a chunk targets that chunk's tile
        for c, tile in enumerate(kl.fwd.chunk_tiles[b]):
            seg = kl.fwd.scatter[b, c * TILE_F:(c + 1) * TILE_F]
            valid = seg[seg >= 0]
            assert np.all(valid // TILE_E == tile)
        # every entity tile appears
        assert set(range(E // TILE_E)) <= set(kl.fwd.chunk_tiles[b].tolist())


def test_scatter_mm_interpret_matches_reference(layout_case):
    kl, heads, tails, rels, mask, E = layout_case
    rng = np.random.default_rng(1)
    B, Fp = kl.fwd.scatter.shape
    C = 16
    values = rng.standard_normal((B, Fp, C)).astype(np.float32)
    out_pallas = pallas_mp._scatter_mm_fwd_impl(
        jnp.asarray(values), jnp.asarray(kl.fwd.scatter),
        jnp.asarray(kl.fwd.chunk_tiles), E, interpret=True)
    out_ref = pallas_mp.scatter_mm_reference(
        jnp.asarray(values), jnp.asarray(kl.fwd.scatter),
        jnp.asarray(kl.fwd.chunk_tiles), E)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_scatter_semantics_vs_canonical(layout_case):
    """Scatter through the kernel layout == scatter through canonical COO."""
    kl, heads, tails, rels, mask, E = layout_case
    rng = np.random.default_rng(2)
    B, F = heads.shape
    C = 4
    # per-fact values keyed by (rel, gather-entity) so both layouts agree
    table = rng.standard_normal((16, C)).astype(np.float32)
    vals_canon = table[rels] * mask[..., None]
    out_canon = batched_segment_sum(jnp.asarray(vals_canon),
                                    jnp.asarray(tails), E)
    vals_kl = table[kl.fwd.rels]
    out_kl = pallas_mp.scatter_mm_reference(
        jnp.asarray(vals_kl), jnp.asarray(kl.fwd.scatter),
        jnp.asarray(kl.fwd.chunk_tiles), E)
    np.testing.assert_allclose(np.asarray(out_canon), np.asarray(out_kl),
                               rtol=1e-5, atol=1e-5)


def test_scatter_mm_gradient():
    rng = np.random.default_rng(3)
    B, F, E, C = 1, 64, 128, 4
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = np.ones((B, F), np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=1)
    Fp = kl.fwd.scatter.shape[1]
    values = jnp.asarray(rng.standard_normal((B, Fp, C)).astype(np.float32))

    def loss_pallas(v):
        out = pallas_mp.scatter_mm_reference(  # fwd impl via reference
            v, jnp.asarray(kl.fwd.scatter), jnp.asarray(kl.fwd.chunk_tiles), E)
        return jnp.sum(out ** 2)

    # custom_vjp path (uses the gather backward); forward replaced by
    # reference on CPU — check the bwd formula against autodiff of reference
    g_auto = jax.grad(loss_pallas)(values)
    out = pallas_mp.scatter_mm_reference(
        values, jnp.asarray(kl.fwd.scatter), jnp.asarray(kl.fwd.chunk_tiles), E)
    g_manual, _, _ = pallas_mp._scatter_mm_bwd(
        E, (jnp.asarray(kl.fwd.scatter), values.dtype), 2.0 * out)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_manual),
                               rtol=1e-5, atol=1e-5)


def test_fused_v2_interpret_matches_reference(layout_case):
    """v2 (tile-per-cell, manual chunk DMA) in interpret mode."""
    import jax.numpy as jnp
    kl, heads, tails, rels, mask, E = layout_case
    rng = np.random.default_rng(9)
    B, Fp = kl.fwd.scatter.shape
    D, J = 16, 2
    fact_rel = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1)
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior = jnp.asarray((rng.random((B, Fp))
                         * (kl.fwd.scatter >= 0)).astype(np.float32))
    o2 = pallas_mp._fused_fwd_impl_v2(
        fact_rel, w, bias, ins, prior, jnp.asarray(kl.fwd.scatter),
        jnp.asarray(kl.fwd.chunk_starts), E, True, interpret=True)
    oref = pallas_mp.fused_gate_scatter_reference(
        fact_rel, w, bias, ins, prior, jnp.asarray(kl.fwd.scatter),
        jnp.asarray(kl.fwd.chunk_tiles), E, True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(oref),
                               rtol=1e-4, atol=1e-5)
