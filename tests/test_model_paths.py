"""The kernel-layout (Pallas) model path and the canonical XLA path must
produce identical results for the same parameters."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.models import ReaRev
from gnn_rag_tpu.utils.synthetic import random_graph_batch, random_rel_hidden

NUM_REL = 16
NUM_ENT_GLOBAL = 1000


@pytest.mark.parametrize("normalized_gnn", [False, True])
@pytest.mark.e2e
def test_layout_path_matches_canonical(normalized_gnn):
    rng = np.random.default_rng(5)
    batch = random_graph_batch(rng, batch_size=3, n_entities=128, n_facts=256,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=32,
                               build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 5, 32)
    cfg = ModelConfig(entity_dim=16, num_iter=2, num_ins=2, num_gnn=2,
                      linear_dropout=0.0, normalized_gnn=normalized_gnn)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT_GLOBAL, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch, rel_h, rel_hinv, rel_mask)

    loss_l, _, dist_l = model.apply(params, batch, rel_h, rel_hinv, rel_mask)
    batch_canon = batch.replace(layout=None)
    loss_c, _, dist_c = model.apply(params, batch_canon, rel_h, rel_hinv,
                                    rel_mask)
    np.testing.assert_allclose(float(loss_l), float(loss_c), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dist_l), np.asarray(dist_c),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.e2e
def test_layout_path_gradients_match():
    rng = np.random.default_rng(6)
    batch = random_graph_batch(rng, batch_size=2, n_entities=128, n_facts=384,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=32,
                               build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 5, 32)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=2,
                      linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT_GLOBAL, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(1), batch, rel_h, rel_hinv, rel_mask)

    def loss_fn(p, b):
        loss, _, _ = model.apply(p, b, rel_h, rel_hinv, rel_mask)
        return loss

    g_l = jax.grad(loss_fn)(params, batch)
    g_c = jax.grad(loss_fn)(params, batch.replace(layout=None))
    flat_l = jax.tree_util.tree_leaves_with_path(g_l)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_c)}
    for k, v in flat_l:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_c[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)


@pytest.mark.e2e
def test_fact_drop_layout_matches_canonical():
    """Training with fact_drop > 0 must stay numerically identical between
    the kernel-layout path and the canonical XLA path (same dropout rng =>
    same dropped facts via the layout perm map)."""
    rng = np.random.default_rng(7)
    batch = random_graph_batch(rng, batch_size=3, n_entities=128, n_facts=256,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=32,
                               build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 5, 32)
    cfg = ModelConfig(entity_dim=16, num_iter=2, num_ins=2, num_gnn=2,
                      linear_dropout=0.0, fact_drop=0.3)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT_GLOBAL, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch, rel_h, rel_hinv, rel_mask)
    dkey = jax.random.PRNGKey(11)

    def run(p, b):
        return model.apply(p, b, rel_h, rel_hinv, rel_mask, training=True,
                           rngs={"dropout": dkey})

    loss_l, _, dist_l = run(params, batch)
    loss_c, _, dist_c = run(params, batch.replace(layout=None))
    np.testing.assert_allclose(float(loss_l), float(loss_c), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dist_l), np.asarray(dist_c),
                               rtol=1e-4, atol=1e-6)
    # dropout is actually active: a different rng changes the loss
    loss_l2, _, _ = model.apply(params, batch, rel_h, rel_hinv, rel_mask,
                                training=True,
                                rngs={"dropout": jax.random.PRNGKey(12)})
    assert abs(float(loss_l2) - float(loss_l)) > 1e-7

    def loss_fn(p, b):
        loss, _, _ = run(p, b)
        return loss

    g_l = jax.grad(loss_fn)(params, batch)
    g_c = jax.grad(loss_fn)(params, batch.replace(layout=None))
    flat_l = jax.tree_util.tree_leaves_with_path(g_l)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_c)}
    for k, v in flat_l:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_c[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)


def test_layout_perm_maps_canonical_masks():
    """DirectionLayout.perm must place canonical per-fact values onto the
    tile-sorted slots (pads -> -1)."""
    import jax.numpy as jnp

    from gnn_rag_tpu.ops.segment import layout_fact_keep

    rng = np.random.default_rng(8)
    batch = random_graph_batch(rng, batch_size=2, n_entities=128, n_facts=384,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=None,
                               build_layout=True)
    keep = (rng.random(batch.fact_mask.shape) < 0.5).astype(np.float32)
    for direction in (batch.layout.fwd, batch.layout.inv):
        got = np.asarray(layout_fact_keep(direction, jnp.asarray(keep)))
        # pads excluded, every real fact's keep appears exactly once
        perm = np.asarray(direction.perm)
        assert (got[perm < 0] == 0).all()
        want_total = (keep * np.asarray(batch.fact_mask)).sum()
        assert got.sum() == pytest.approx(want_total)
        # and the kept facts are the right ones, not just the right count
        B = keep.shape[0]
        for b in range(B):
            real = perm[b] >= 0
            np.testing.assert_array_equal(got[b][real],
                                          keep[b][perm[b][real]])
