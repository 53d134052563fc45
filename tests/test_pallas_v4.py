"""v4 both-direction fused gate-scatter vs XLA reference, interpret mode.

v4 is the production TPU path (models/rearev.py): both message directions in
one launch, whole-sample [B, E, J*D] VMEM-resident outputs accumulated via
dynamic sublane slices. Forward and the hand-written backward kernel must
match the XLA reference formulation and its autodiff, including the padded
chunks both directions share (num_chunks bound) and the J=1 shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rag_tpu.data.kernel_layout import build_kernel_layout, pack_samples
from gnn_rag_tpu.ops import pallas_mp as pm


def _make_case(J, seed=0, round_nc_to=1, D=16):
    rng = np.random.default_rng(seed)
    B, F, E = 2, 300, 256
    heads = rng.integers(0, E, (B, F)).astype(np.int32)
    tails = rng.integers(0, E, (B, F)).astype(np.int32)
    rels = np.zeros((B, F), np.int32)
    mask = (rng.random((B, F)) > 0.15).astype(np.float32)
    kl = build_kernel_layout(heads, rels, tails, mask, E, pad_rel=1)
    # both directions padded to a common chunk bound, like the loader does
    nc = max(kl.fwd.chunk_tiles.shape[1], kl.inv.chunk_tiles.shape[1]) + 1
    nc = -(-nc // round_nc_to) * round_nc_to
    from gnn_rag_tpu.data.kernel_layout import build_sample_direction
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
    kl = pack_samples(fwd_s, inv_s, E, 1, num_chunks=nc)
    Fp = kl.fwd.scatter.shape[1]
    vals_f = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    vals_i = jnp.asarray(rng.standard_normal((B, Fp, D)).astype(np.float32))
    ins = jnp.asarray(rng.standard_normal((B, J, D)).astype(np.float32))
    prior_f = jnp.asarray((rng.random((B, Fp))
                           * (kl.fwd.scatter >= 0)).astype(np.float32))
    prior_i = jnp.asarray((rng.random((B, Fp))
                           * (kl.inv.scatter >= 0)).astype(np.float32))
    sc_f = jnp.asarray(kl.fwd.scatter)
    sc_i = jnp.asarray(kl.inv.scatter)
    ct2 = jnp.stack([jnp.asarray(kl.fwd.chunk_tiles),
                     jnp.asarray(kl.inv.chunk_tiles)], axis=1)
    return vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E


@pytest.mark.parametrize("J,apply_relu", [(2, True), (2, False), (1, True),
                                          (3, True)])
def test_v4_fwd_matches_reference(J, apply_relu):
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(J)
    got_f, got_i = pm._v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                   sc_f, sc_i, ct2, E, apply_relu,
                                   interpret=True)
    want_f, want_i = pm.gated_scatter_v4_reference(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E,
        apply_relu)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("J,apply_relu", [(2, True), (2, False), (3, True)])
@pytest.mark.e2e
def test_v4_bwd_kernel_matches_autodiff(J, apply_relu):
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(J)

    def loss(vf, vi, ii, pf, pi):
        of, oi = pm.gated_scatter_v4_reference(vf, vi, ii, pf, pi, sc_f,
                                               sc_i, ct2, E, apply_relu)
        return jnp.sum(jnp.sin(of)) + jnp.sum(jnp.cos(oi))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        vals_f, vals_i, ins, prior_f, prior_i)
    of, oi = pm.gated_scatter_v4_reference(vals_f, vals_i, ins, prior_f,
                                           prior_i, sc_f, sc_i, ct2, E,
                                           apply_relu)
    g_kernel = pm._v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, sc_f,
                               sc_i, ct2, jnp.cos(of), -jnp.sin(oi),
                               apply_relu, interpret=True)
    for name, a, b in zip(["dvals_f", "dvals_i", "dins", "dprior_f",
                           "dprior_i"], g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_v4_custom_vjp_cpu_fallback_grads():
    """On CPU, gated_scatter_v4's custom VJP routes to the XLA backward —
    it must match autodiff of the reference too (this is the path CI and
    the virtual-device mesh tests exercise)."""
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(2)

    def loss_ref(vf, ii):
        of, oi = pm.gated_scatter_v4_reference(vf, vals_i, ii, prior_f,
                                               prior_i, sc_f, sc_i, ct2, E,
                                               True)
        return jnp.sum(of * of) + jnp.sum(oi)

    def loss_vjp(vf, ii):
        # interpret-mode forward + the custom VJP's XLA backward path
        of, oi = pm.gated_scatter_v4(vf, vals_i, ii, prior_f,
                                     prior_i, sc_f, sc_i, ct2, E, True)
        return jnp.sum(of * of) + jnp.sum(oi)

    ga = jax.grad(loss_ref, argnums=(0, 1))(vals_f, ins)
    gb = jax.grad(loss_vjp, argnums=(0, 1))(vals_f, ins)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


def test_rearev_v4_matches_v3_forward(monkeypatch):
    """Full-model check: ReaRev with GNN_RAG_GATE_SCATTER=v4 must produce
    the same forward/loss as v3 on a layout batch (CPU reference paths)."""
    from gnn_rag_tpu.config import ModelConfig
    from gnn_rag_tpu.models import ReaRev
    from gnn_rag_tpu.utils.synthetic import (random_graph_batch,
                                             random_rel_hidden)

    rng = np.random.default_rng(7)
    batch = random_graph_batch(rng, batch_size=3, n_entities=128, n_facts=256,
                               num_relation=12, num_entity_global=1000,
                               word_dim=32, build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, 13, 5, 32)
    cfg = ModelConfig(entity_dim=16, num_iter=2, num_ins=2, num_gnn=2,
                      lm="sbert", linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=1000, num_relation=12)
    params = model.init(jax.random.PRNGKey(0), batch, jnp.asarray(rel_h),
                        jnp.asarray(rel_hinv), jnp.asarray(rel_mask))

    outs = {}
    for variant in ("v3", "v4"):
        monkeypatch.setenv("GNN_RAG_GATE_SCATTER", variant)
        outs[variant] = model.apply(params, batch, rel_h, rel_hinv, rel_mask)
    for a, b in zip(outs["v3"], outs["v4"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("J", [2, 3])
def test_v4_split_launch_matches_reference(J, monkeypatch):
    """Forcing the big-E VMEM split (one launch per direction) must match
    the dual-direction path and the reference bit-for-bit. Limit 0.3MB:
    the dual launch (0.5MB of resident blocks at these shapes) splits, one
    direction's full-J block (0.25MB) still fits."""
    monkeypatch.setenv("GNN_RAG_V4_VMEM_LIMIT_MB", "0.3")
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(J)
    assert pm._v4_vmem_split(E, J, 16) and pm._v4s_fits(E, J, 16)
    got_f, got_i = pm._v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                   sc_f, sc_i, ct2, E, True, interpret=True)
    want_f, want_i = pm.gated_scatter_v4_reference(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)

    def loss(vf, vi, ii, pf, pi):
        of, oi = pm.gated_scatter_v4_reference(vf, vi, ii, pf, pi, sc_f,
                                               sc_i, ct2, E, True)
        return jnp.sum(jnp.sin(of)) + jnp.sum(jnp.cos(oi))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        vals_f, vals_i, ins, prior_f, prior_i)
    g_kernel = pm._v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, sc_f,
                               sc_i, ct2, jnp.cos(want_f),
                               -jnp.sin(want_i), True, interpret=True)
    for name, a, b in zip(["dvf", "dvi", "dins", "dpf", "dpi"],
                          g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


# K=8 (the shipping default, _pick_k) stays in the fast default suite so a
# plain `pytest tests/` still exercises the k_per_cell path (ADVICE r4)
@pytest.mark.parametrize("K", [
    pytest.param(1, marks=pytest.mark.e2e),
    pytest.param(2, marks=pytest.mark.e2e), 8])
def test_v4_k_per_cell_equivalence(K, monkeypatch):
    """Fwd+bwd results are identical for every chunks-per-grid-cell K
    (fatter grid iterations only amortise per-iteration cost)."""
    monkeypatch.setenv("GNN_RAG_V4_K", str(K))
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(
        2, round_nc_to=K)
    NC = ct2.shape[2]
    assert pm._pick_k(NC) == K
    got_f, got_i = pm._v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                   sc_f, sc_i, ct2, E, True, interpret=True)
    want_f, want_i = pm.gated_scatter_v4_reference(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)

    def loss(vf, vi, ii, pf, pi):
        of, oi = pm.gated_scatter_v4_reference(vf, vi, ii, pf, pi, sc_f,
                                               sc_i, ct2, E, True)
        return jnp.sum(jnp.sin(of)) + jnp.sum(jnp.cos(oi))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        vals_f, vals_i, ins, prior_f, prior_i)
    of, oi = pm.gated_scatter_v4_reference(vals_f, vals_i, ins, prior_f,
                                           prior_i, sc_f, sc_i, ct2, E, True)
    g_kernel = pm._v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, sc_f,
                               sc_i, ct2, jnp.cos(of), -jnp.sin(oi),
                               True, interpret=True)
    for name, a, b in zip(["dvf", "dvi", "dins", "dpf", "dpi"],
                          g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def _grad_check(vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E,
                interpret=True):
    def loss(vf, vi, ii, pf, pi):
        of, oi = pm.gated_scatter_v4_reference(vf, vi, ii, pf, pi, sc_f,
                                               sc_i, ct2, E, True)
        return jnp.sum(jnp.sin(of)) + jnp.sum(jnp.cos(oi))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        vals_f, vals_i, ins, prior_f, prior_i)
    of, oi = pm.gated_scatter_v4_reference(vals_f, vals_i, ins, prior_f,
                                           prior_i, sc_f, sc_i, ct2, E, True)
    g_kernel = pm._v4_bwd_impl(vals_f, vals_i, ins, prior_f, prior_i, sc_f,
                               sc_i, ct2, jnp.cos(of), -jnp.sin(oi), True,
                               interpret=interpret)
    for name, a, b in zip(["dvf", "dvi", "dins", "dpf", "dpi"],
                          g_kernel, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_v4_jsplit_launch_matches_reference(monkeypatch):
    """The huge-E tier (CWQ E=8192 J=3 bucket, r5): even one direction's
    full-J resident block overflows scoped VMEM, so the launch splits per
    instruction. At J=3 D=64 the full-J lanes are 256 (0.5MB resident) vs
    128 per instruction (0.25MB); limit 0.3MB forces exactly this tier."""
    J, D = 3, 64
    monkeypatch.setenv("GNN_RAG_V4_VMEM_LIMIT_MB", "0.3")
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(
        J, D=D)
    assert (pm._v4_vmem_split(E, J, D) and not pm._v4s_fits(E, J, D)
            and pm._v4s_fits(E, 1, D))
    got_f, got_i = pm._v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                   sc_f, sc_i, ct2, E, True, interpret=True)
    want_f, want_i = pm.gated_scatter_v4_reference(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)
    _grad_check(vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E)


def test_v4_xla_fallback_tier_matches_reference(monkeypatch):
    """Beyond any resident-block budget the op falls back to pure XLA —
    forward is the reference itself; backward (_v4_bwd_dir_xla) must match
    autodiff."""
    J, D = 3, 64
    monkeypatch.setenv("GNN_RAG_V4_VMEM_LIMIT_MB", "0.1")
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(
        J, D=D)
    assert not pm._v4s_fits(E, 1, D)
    got_f, got_i = pm._v4_fwd_impl(vals_f, vals_i, ins, prior_f, prior_i,
                                   sc_f, sc_i, ct2, E, True, interpret=True)
    want_f, want_i = pm.gated_scatter_v4_reference(
        vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E, True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)
    _grad_check(vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E)


@pytest.mark.parametrize("K", [2, 8])
@pytest.mark.e2e
def test_v4s_k_per_cell_equivalence(K, monkeypatch):
    """Single-direction (big-E split) launches honour k_per_cell too."""
    monkeypatch.setenv("GNN_RAG_V4_K", str(K))
    vals_f, vals_i, ins, prior_f, prior_i, sc_f, sc_i, ct2, E = _make_case(
        3, round_nc_to=K)
    NC = ct2.shape[2]
    J, D = ins.shape[1], vals_f.shape[2]
    got = pm._v4s_call(vals_f, prior_f, sc_f, ct2[:, 0], E, J, D, True,
                       True, ins)
    want, _ = pm.gated_scatter_v4_reference(vals_f, vals_i, ins, prior_f,
                                            prior_i, sc_f, sc_i, ct2, E,
                                            True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g = jnp.cos(want)
    dv, dp, dins = pm._v4s_bwd_call(vals_f, prior_f, sc_f, ct2[:, 0], g, J,
                                    D, True, True, ins)

    def loss(vf, ii, pf):
        of, _ = pm.gated_scatter_v4_reference(vf, vals_i, ii, pf, prior_i,
                                              sc_f, sc_i, ct2, E, True)
        return jnp.sum(jnp.sin(of))

    ga = jax.grad(loss, argnums=(0, 1, 2))(vals_f, ins, prior_f)
    for name, a, b in zip(["dv", "dins", "dp"], (dv, dins, dp),
                          (ga[0], ga[1], ga[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
