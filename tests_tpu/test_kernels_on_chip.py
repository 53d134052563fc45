"""Mosaic-compiled kernel value/grad parity on the real TPU chip.

CI (tests/) exercises these kernels in interpret mode on CPU; this module is
the hardware truth check: the same fused gate-scatter and flash-attention
kernels, compiled by Mosaic and executed on the chip, must match the XLA
reference formulations to float32 tolerance. Run: python -m pytest tests_tpu/ -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rag_tpu.data.kernel_layout import build_kernel_layout
from gnn_rag_tpu.ops import pallas_mp as pm


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, F, E, D, J = 2, 1500, 512, 64, 2
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = (rng.random((B, F)) > 0.1).astype(np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=1)
    Fp = kl.fwd.scatter.shape[1]
    fact_rel = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1)
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior = jnp.asarray((rng.random((B, Fp))
                         * (kl.fwd.scatter >= 0)).astype(np.float32))
    return (fact_rel, w, bias, ins, prior, jnp.asarray(kl.fwd.scatter),
            jnp.asarray(kl.fwd.chunk_starts), jnp.asarray(kl.fwd.chunk_tiles),
            E)


def test_fused_fwd_v1_on_chip(case):
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case
    got = jax.jit(lambda *a: pm.fused_gate_scatter(*a, ct, E, True))(
        fact_rel, w, bias, ins, prior, sc)
    with jax.default_matmul_precision("highest"):  # match kernel fp32
        want = pm.fused_gate_scatter_reference(fact_rel, w, bias, ins,
                                               prior, sc, ct, E, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_fwd_v2_on_chip(case):
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case
    got = jax.jit(lambda *a: pm.fused_gate_scatter_v2(*a, cs, ct, E, True))(
        fact_rel, w, bias, ins, prior, sc)
    with jax.default_matmul_precision("highest"):
        want = pm.fused_gate_scatter_reference(fact_rel, w, bias, ins,
                                               prior, sc, ct, E, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v3_fwd_on_chip(case):
    """v3 (production path): projected values in, gate+scatter in kernel."""
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case
    with jax.default_matmul_precision("highest"):
        fact_rl = fact_rel @ w + bias
        want = pm.gated_scatter_v3_reference(fact_rl, ins, prior, sc, ct, E,
                                             True)
    got = jax.jit(lambda *a: pm.gated_scatter_v3(*a, sc, ct, E, True))(
        fact_rl, ins, prior)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v3_grads_on_chip(case):
    """custom_vjp dispatches the Pallas bwd kernel on TPU; compare to the
    reference autodiff."""
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case
    with jax.default_matmul_precision("highest"):
        fact_rl = fact_rel @ w + bias

    def loss_k(fr, ii, pri):
        return jnp.sum(jnp.sin(pm.gated_scatter_v3(fr, ii, pri, sc, ct, E,
                                                   True)))

    def loss_r(fr, ii, pri):
        return jnp.sum(jnp.sin(pm.gated_scatter_v3_reference(
            fr, ii, pri, sc, ct, E, True)))

    g_k = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(fact_rl, ins, prior)
    with jax.default_matmul_precision("highest"):
        g_r = jax.grad(loss_r, argnums=(0, 1, 2))(fact_rl, ins, prior)
    for name, a, b in zip(["dfact_rl", "dins", "dprior"], g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_bwd_on_chip(case):
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case

    def loss_pallas(fr, wi, bi, ii, pri):
        out = pm.fused_gate_scatter_v2(fr, wi, bi, ii, pri, sc, cs, ct, E,
                                       True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(fr, wi, bi, ii, pri):
        out = pm.fused_gate_scatter_reference(fr, wi, bi, ii, pri, sc, ct, E,
                                              True)
        return jnp.sum(jnp.sin(out))

    g_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4)))(
        fact_rel, w, bias, ins, prior)
    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            fact_rel, w, bias, ins, prior)
    for name, a, b in zip(["dfact_rel", "dw", "dbias", "dins", "dprior"],
                          g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_scatter_mm_on_chip(case):
    fact_rel, w, bias, ins, prior, sc, cs, ct, E = case
    vals = fact_rel * prior[..., None]
    got = jax.jit(lambda v: pm.scatter_mm(v, sc, ct, E))(vals)
    want = pm.scatter_mm_reference(vals, sc, ct, E)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_fwd_bwd_on_chip():
    from gnn_rag_tpu.llm_tpu.flash_attention import (
        _reference, flash_attention, flash_attention_reference_bwd)
    rng = np.random.default_rng(1)
    B, L, H, D = 1, 512, 4, 128
    q = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    got = jax.jit(flash_attention)(q, k, v)
    with jax.default_matmul_precision("highest"):
        want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    g = jnp.asarray(rng.standard_normal(got.shape).astype(np.float32))
    grads = jax.jit(lambda *a: jax.vjp(flash_attention, *a)[1](g))(q, k, v)
    with jax.default_matmul_precision("highest"):
        ref = flash_attention_reference_bwd(q, k, v, g)
    for name, a, b in zip("dq dk dv".split(), grads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


@pytest.fixture(scope="module")
def v4_case():
    from gnn_rag_tpu.data.kernel_layout import (build_sample_direction,
                                                pack_samples)
    rng = np.random.default_rng(1)
    B, F, E, D, J = 2, 1500, 512, 64, 2
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = (rng.random((B, F)) > 0.1).astype(np.float32)
    fwd_s = [build_sample_direction(tails[b][mask[b] > 0],
                                    heads[b][mask[b] > 0],
                                    rels[b][mask[b] > 0],
                                    mask[b][mask[b] > 0], E, 1)
             for b in range(B)]
    inv_s = [build_sample_direction(heads[b][mask[b] > 0],
                                    tails[b][mask[b] > 0],
                                    rels[b][mask[b] > 0],
                                    mask[b][mask[b] > 0], E, 1)
             for b in range(B)]
    # tuple layout: (scatter, gather, rels, weight, chunk_tiles, starts, perm)
    nc = max(max(s[4].shape[0] for s in fwd_s),
             max(s[4].shape[0] for s in inv_s)) + 1
    nc = -(-nc // 8) * 8
    kl = pack_samples(fwd_s, inv_s, E, 1, num_chunks=nc)
    Fp = kl.fwd.scatter.shape[1]
    vals_f = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    vals_i = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior_f = jnp.asarray((rng.random((B, Fp))
                           * (kl.fwd.scatter >= 0)).astype(np.float32))
    prior_i = jnp.asarray((rng.random((B, Fp))
                           * (kl.inv.scatter >= 0)).astype(np.float32))
    ct2 = jnp.stack([jnp.asarray(kl.fwd.chunk_tiles),
                     jnp.asarray(kl.inv.chunk_tiles)], axis=1)
    return (vals_f, vals_i, ins, prior_f, prior_i,
            jnp.asarray(kl.fwd.scatter), jnp.asarray(kl.inv.scatter), ct2, E)


@pytest.mark.parametrize("K", [1, 8])
def test_v4_fwd_bwd_on_chip(v4_case, K, monkeypatch):
    """Mosaic-compiled v4 (production path) at k_per_cell in {1, 8}."""
    monkeypatch.setenv("GNN_RAG_V4_K", str(K))
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = v4_case
    got_f, got_i = jax.jit(
        lambda *a: pm._v4_fwd_impl(*a, ct2, E, True))(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i)
    with jax.default_matmul_precision("highest"):
        want_f, want_i = pm.gated_scatter_v4_reference(
            vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)

    def loss(vf, vi, ii, pf, pi):
        with jax.default_matmul_precision("highest"):
            of, oi = pm.gated_scatter_v4_reference(vf, vi, ii, pf, pi, sc_f,
                                                   sc_i, ct2, E, True)
        return jnp.sum(jnp.sin(of)) + jnp.sum(jnp.cos(oi))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        vals_f, vals_i, ins, prior_f, prior_i)
    g_kernel = jax.jit(
        lambda gf, gi: pm._v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                       sc_f, sc_i, ct2, gf, gi, True))(
        jnp.cos(want_f), -jnp.sin(want_i))
    for name, a, b in zip(["dvf", "dvi", "dins", "dpf", "dpi"],
                          g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
