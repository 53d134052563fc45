"""Pretrained relation-embedding path (relation_emb_file,
base_model.py:122-134 + 153-162): frozen table + projection instead of a
trainable relation embedding."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.data.loader import load_relation_emb
from gnn_rag_tpu.models import ReaRev
from gnn_rag_tpu.models.nsm import NSM
from gnn_rag_tpu.utils.synthetic import random_graph_batch

NUM_REL = 16          # num_kb_relation (incl. self-loop row)
NUM_ENT_GLOBAL = 1000


def test_load_relation_emb_row_conventions(tmp_path):
    d = 12
    base = np.random.default_rng(0).standard_normal((7, d)).astype(np.float32)
    path = str(tmp_path / "rel.npy")
    np.save(path, base)

    # inverse + self loop: rows = 2*7 + 2 = 16 = nkr + 1 with nkr = 15
    emb = load_relation_emb(path, 15, True, True)
    assert emb.shape == (16, d)
    np.testing.assert_array_equal(emb[:7], base)
    np.testing.assert_array_equal(emb[7:14], base)   # inverse rows reuse fwd
    assert (emb[14:] == 0).all()                      # self-loop + pad rows

    # no inverse, self loop: rows = 7 + 2 = 9 = nkr + 1 with nkr = 8
    emb = load_relation_emb(path, 8, False, True)
    assert emb.shape == (9, d)

    # mismatch -> None (the reference's 'Random Init' branch)
    assert load_relation_emb(path, 10, False, True) is None
    assert load_relation_emb(str(tmp_path / "absent.npy"), 8, False, True) is None


@pytest.mark.parametrize("model_cls", [ReaRev, NSM])
@pytest.mark.e2e
def test_pretrained_relation_table(model_cls):
    rng = np.random.default_rng(3)
    batch = random_graph_batch(rng, batch_size=2, n_entities=32, n_facts=128,
                               num_relation=NUM_REL,
                               num_entity_global=NUM_ENT_GLOBAL, word_dim=32)
    rel_tbl = rng.standard_normal((NUM_REL + 1, 20)).astype(np.float32)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      num_step=2, linear_dropout=0.0)
    model = model_cls(cfg=cfg, num_entity=NUM_ENT_GLOBAL, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch, relation_emb=rel_tbl)

    # the trainable relation table must NOT be created in this branch
    flat = [jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_leaves_with_path(params)]
    assert not any("relation_embedding" in k for k in flat), flat

    loss, pred, dist = model.apply(params, batch, relation_emb=rel_tbl)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(dist).sum(axis=1),
                               np.ones(2), rtol=1e-5)

    # the table is data, not a parameter: changing it changes the output
    loss2, _, _ = model.apply(params, batch, relation_emb=rel_tbl * 2.0)
    assert abs(float(loss2) - float(loss)) > 1e-9

    # gradients flow through the projection
    def loss_fn(p):
        l, _, _ = model.apply(p, batch, relation_emb=rel_tbl)
        return l

    grads = jax.grad(loss_fn)(params)
    total = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree_util.tree_leaves(grads))
    assert total > 0.0
