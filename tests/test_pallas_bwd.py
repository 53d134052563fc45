"""Pallas backward kernel for the fused gate-scatter vs XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rag_tpu.data.kernel_layout import build_kernel_layout
from gnn_rag_tpu.ops import pallas_mp as pm


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, F, E, D, J = 2, 300, 256, 16, 2
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = (rng.random((B, F)) > 0.15).astype(np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=1)
    Fp = kl.fwd.scatter.shape[1]
    fact_rel = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1)
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior = jnp.asarray((rng.random((B, Fp))
                         * (kl.fwd.scatter >= 0)).astype(np.float32))
    sc = jnp.asarray(kl.fwd.scatter)
    ct = jnp.asarray(kl.fwd.chunk_tiles)
    return fact_rel, w, bias, ins, prior, sc, ct, E


@pytest.mark.parametrize("apply_relu", [True, False])
def test_bwd_kernel_matches_autodiff(case, apply_relu):
    fact_rel, w, bias, ins, prior, sc, ct, E = case

    def loss(fr, wi, bi, ii, pri):
        out = pm.fused_gate_scatter_reference(fr, wi, bi, ii, pri, sc, ct, E,
                                              apply_relu)
        return jnp.sum(jnp.sin(out))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        fact_rel, w, bias, ins, prior)
    out = pm.fused_gate_scatter_reference(fact_rel, w, bias, ins, prior, sc,
                                          ct, E, apply_relu)
    g_out = jnp.cos(out)  # d loss / d out
    g_kernel = pm._fused_bwd_pallas_impl(fact_rel, w, bias, ins, prior, sc,
                                         ct, g_out, apply_relu,
                                         interpret=True)
    names = ["dfact_rel", "dw", "dbias", "dins", "dprior"]
    for name, a, b in zip(names, g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
