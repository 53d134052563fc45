"""NSM and GraftNet: forward/grad smoke + overfit on the synthetic fixture."""

import math

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gnn_rag_tpu.models.nsm import NSM
from gnn_rag_tpu.models.graftnet import GraftNet
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import (random_graph_batch, random_records,
                                         random_rel_hidden)

NUM_REL = 12
NUM_ENT = 1000


def _setup(model_cls, **cfg_kw):
    rng = np.random.default_rng(11)
    batch = random_graph_batch(rng, batch_size=3, n_entities=128, n_facts=512,
                               num_relation=NUM_REL, num_entity_global=NUM_ENT,
                               word_dim=32, build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 4, 32)
    cfg = ModelConfig(entity_dim=16, linear_dropout=0.0, **cfg_kw)
    model = model_cls(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch, rel_h, rel_hinv, rel_mask)
    return model, params, batch, (rel_h, rel_hinv, rel_mask)


@pytest.mark.parametrize("kw", [
    dict(model_name="NSM", num_step=3),
    dict(model_name="NSM", num_step=2, reason_kb=True),
    dict(model_name="NSM", num_step=2, lambda_back=0.1, lambda_constrain=0.1),
])
def test_nsm_forward_and_grad(kw):
    model, params, batch, rel = _setup(NSM, **kw)
    loss, pred, dist = model.apply(params, batch, *rel)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(dist).sum(1), 1.0, rtol=1e-4)

    g = jax.grad(lambda p: model.apply(p, batch, *rel)[0])(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_nsm_layout_path_matches_canonical():
    model, params, batch, rel = _setup(NSM, model_name="NSM", num_step=2)
    _, _, d1 = model.apply(params, batch, *rel)
    _, _, d2 = model.apply(params, batch.replace(layout=None), *rel)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("loss_type", ["bce", "kl"])
def test_graftnet_forward_and_grad(loss_type):
    model, params, batch, rel = _setup(
        GraftNet, model_name="GraftNet", num_layer=2, loss_type=loss_type)
    loss, pred, dist = model.apply(params, batch, *rel)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(dist).sum(1), 1.0, rtol=1e-4)
    g = jax.grad(lambda p: model.apply(p, batch, *rel)[0])(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("model_name,extra", [
    ("NSM", dict(num_step=2)),
    ("GraftNet", dict(num_layer=2, loss_type="bce", lr_scale=1.0)),
])
@pytest.mark.e2e
def test_models_learn_synthetic(model_name, extra, tmp_path):
    extra = dict(extra)
    extra.pop("lr_scale", None)
    rng = np.random.default_rng(13)
    ds = random_records(rng, n_questions=16, num_relation=NUM_REL,
                        n_entities_max=16, n_facts_max=40)
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), 32))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 4, 32)
    cfg = Config(
        model=ModelConfig(model_name=model_name, entity_dim=16,
                          linear_dropout=0.0, **extra),
        train=TrainConfig(batch_size=8, test_batch_size=8, lr=5e-3,
                          decay_rate=0.99, checkpoint_dir=str(tmp_path)),
    )
    tr = Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                 num_entity=NUM_ENT, num_kb_relation=NUM_REL,
                 rel_hidden=rel_h, rel_hidden_inv=rel_hinv,
                 rel_text_mask=rel_mask)
    loss0, _, _ = tr.train_epoch()
    for _ in range(12):
        loss, h1, _ = tr.train_epoch()
    assert loss < loss0, (loss0, loss)
    assert math.isfinite(loss)
