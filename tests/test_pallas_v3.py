"""v3 gate-scatter (projected fact values) vs XLA reference, interpret mode.

v3 is the production TPU path (models/rearev.py, models/nsm.py,
models/encoders.py TypeLayer): the rel_linear projection runs in XLA, the
kernel only gates+scatters. Forward and the hand-written backward kernel must
match the XLA reference formulation and its autodiff.
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
    B, F, E, D, J = 2, 300, 256, 16, 2
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = (rng.random((B, F)) > 0.15).astype(np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=1)
    Fp = kl.fwd.scatter.shape[1]
    fact_rl = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior = jnp.asarray((rng.random((B, Fp))
                         * (kl.fwd.scatter >= 0)).astype(np.float32))
    sc = jnp.asarray(kl.fwd.scatter)
    ct = jnp.asarray(kl.fwd.chunk_tiles)
    return fact_rl, ins, prior, sc, ct, E


@pytest.mark.parametrize("apply_relu", [True, False])
def test_v3_fwd_matches_reference(case, apply_relu):
    fact_rl, ins, prior, sc, ct, E = case
    got = pm._fused_v3_fwd_impl(fact_rl, ins, prior, sc, ct, E, apply_relu,
                                interpret=True)
    want = pm.gated_scatter_v3_reference(fact_rl, ins, prior, sc, ct, E,
                                         apply_relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("apply_relu", [True, False])
def test_v3_bwd_kernel_matches_autodiff(case, apply_relu):
    fact_rl, ins, prior, sc, ct, E = case

    def loss(fr, ii, pri):
        out = pm.gated_scatter_v3_reference(fr, ii, pri, sc, ct, E,
                                            apply_relu)
        return jnp.sum(jnp.sin(out))

    g_auto = jax.grad(loss, argnums=(0, 1, 2))(fact_rl, ins, prior)
    out = pm.gated_scatter_v3_reference(fact_rl, ins, prior, sc, ct, E,
                                        apply_relu)
    g_out = jnp.cos(out)
    g_kernel = pm._fused_v3_bwd_pallas_impl(fact_rl, ins, prior, sc, ct,
                                            g_out, apply_relu, interpret=True)
    for name, a, b in zip(["dfact_rl", "dins", "dprior"], g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_v3_single_instruction(case):
    """J=1 path (NSM / TypeLayer shape)."""
    fact_rl, ins, prior, sc, ct, E = case
    ins1 = ins[:, :1]
    got = pm._fused_v3_fwd_impl(fact_rl, ins1, prior, sc, ct, E, False,
                                interpret=True)
    want = pm.gated_scatter_v3_reference(fact_rl, ins1, prior, sc, ct, E,
                                         False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
