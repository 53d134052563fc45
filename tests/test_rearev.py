"""ReaRev model: forward shape/normalisation/grad smoke tests on tiny graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.models import ReaRev
from gnn_rag_tpu.utils.synthetic import random_graph_batch, random_rel_hidden

NUM_REL = 16
NUM_ENT_GLOBAL = 1000


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    batch = random_graph_batch(rng, batch_size=4, n_entities=32, n_facts=128,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=48)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 6, 48)
    cfg = ModelConfig(entity_dim=24, num_iter=2, num_ins=2, num_gnn=2,
                      lm="sbert", linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT_GLOBAL, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch,
                        jnp.asarray(rel_h), jnp.asarray(rel_hinv),
                        jnp.asarray(rel_mask))
    return model, params, batch, (rel_h, rel_hinv, rel_mask)


def test_forward_shapes_and_normalisation(setup):
    model, params, batch, (rel_h, rel_hinv, rel_mask) = setup
    loss, pred, pred_dist = model.apply(params, batch, rel_h, rel_hinv, rel_mask)
    B, E = batch.seed_dist.shape
    assert pred_dist.shape == (B, E)
    assert pred.shape == (B,)
    assert np.isfinite(float(loss))
    # softmax over candidate support sums to 1
    np.testing.assert_allclose(np.asarray(pred_dist).sum(axis=1),
                               np.ones(B), rtol=1e-5)
    # non-candidate slots (incl. masked seeds on WebQSP-style data) carry ~0
    cand = np.asarray(batch.candidate_mask(NUM_ENT_GLOBAL))
    assert np.asarray(pred_dist)[cand == 0].max() < 1e-9


@pytest.mark.e2e
def test_gradients_flow(setup):
    model, params, batch, (rel_h, rel_hinv, rel_mask) = setup

    def loss_fn(p):
        loss, _, _ = model.apply(p, batch, rel_h, rel_hinv, rel_mask)
        return loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0.0


@pytest.mark.e2e
def test_jit_and_batch_invariance(setup):
    """Padding more facts/entities must not change the result."""
    model, params, batch, (rel_h, rel_hinv, rel_mask) = setup
    fwd = jax.jit(lambda p, b: model.apply(p, b, rel_h, rel_hinv, rel_mask))
    loss1, _, dist1 = fwd(params, batch)

    import dataclasses
    from gnn_rag_tpu.data.batch import pad_to
    pad = lambda x, size, axis, fill=0: jnp.asarray(
        pad_to(np.asarray(x), size, axis, fill))
    F2, E2 = batch.max_facts + 64, batch.max_entities + 16
    batch2 = dataclasses.replace(
        batch,
        heads=pad(batch.heads, F2, 1), tails=pad(batch.tails, F2, 1),
        rels=pad(batch.rels, F2, 1, NUM_REL),
        fact_mask=pad(batch.fact_mask, F2, 1),
        fact_rel_weight=pad(batch.fact_rel_weight, F2, 1),
        entity_gids=pad(batch.entity_gids, E2, 1, NUM_ENT_GLOBAL),
        ent_present=pad(batch.ent_present, E2, 1),
        seed_dist=pad(batch.seed_dist, E2, 1),
        query_entities=pad(batch.query_entities, E2, 1),
        answer_dist=pad(batch.answer_dist, E2, 1),
    )
    loss2, _, dist2 = fwd(params, batch2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dist1),
                               np.asarray(dist2)[:, :batch.max_entities],
                               rtol=1e-4, atol=1e-6)
