"""Model variants: LSTM question encoder, pretrained entity/word embeddings,
pos_emb, trainable relation-embedding fallback."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.models import ReaRev
from gnn_rag_tpu.utils.synthetic import random_graph_batch, random_rel_hidden

NUM_REL = 10
NUM_ENT = 500


def make_batch(rng, num_word=50):
    batch = random_graph_batch(rng, batch_size=2, n_entities=32, n_facts=96,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT,
                               word_dim=None, q_len=6)
    return batch.replace(
        q_tokens=(np.asarray(batch.q_tokens) % num_word).astype(np.int32))


def check(model, params, batch, *args):
    loss, pred, dist = model.apply(params, batch, *args)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(dist).sum(1), 1.0, rtol=1e-4)
    g = jax.grad(lambda p: model.apply(p, batch, *args)[0])(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.e2e
def test_lstm_encoder_path():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      lm="lstm", word_dim=24, linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL,
                   num_word=50)
    params = model.init(jax.random.PRNGKey(0), batch)
    check(model, params, batch)


def test_lstm_with_pretrained_word_emb():
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    word_emb = rng.standard_normal((51, 24)).astype(np.float32)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      lm="lstm", word_dim=24, linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL,
                   num_word=50)
    params = model.init(jax.random.PRNGKey(0), batch, None, None, None,
                        None, word_emb)
    check(model, params, batch, None, None, None, None, word_emb)
    assert "word_embedding" not in str(jax.tree_util.tree_structure(params))


@pytest.mark.e2e
def test_pretrained_entity_embeddings():
    rng = np.random.default_rng(2)
    batch = make_batch(rng)
    rel = random_rel_hidden(rng, NUM_REL + 1, 4, 24)
    ent_emb = rng.standard_normal((NUM_ENT + 1, 20)).astype(np.float32)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      lm="sbert", word_dim=24, linear_dropout=0.0)
    batch = batch.replace(q_hidden=rng.standard_normal(
        (2, 6, 24)).astype(np.float32))
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch, *rel, ent_emb)
    check(model, params, batch, *rel, ent_emb)
    keys = str(jax.tree_util.tree_structure(params))
    assert "entity_linear" in keys and "type_layer" not in keys


def test_pos_emb_and_trainable_rel_fallback():
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    batch = batch.replace(q_hidden=rng.standard_normal(
        (2, 6, 24)).astype(np.float32))
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      lm="sbert", word_dim=24, linear_dropout=0.0,
                      pos_emb=True)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch)  # no rel_hidden
    check(model, params, batch)
    keys = str(jax.tree_util.tree_structure(params))
    assert "relation_embedding" in keys and "pos_emb0" in keys
