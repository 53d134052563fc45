"""Mesh-aware Trainer: dp-sharded training on the 8-device CPU mesh matches
the single-device trajectory."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import Config, ModelConfig, TrainConfig
from gnn_rag_tpu.parallel.mesh import make_mesh
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import random_records, random_rel_hidden

NUM_REL = 8
NUM_ENT = 1000


def build_trainer(tmp_path, mesh=None, tag="a"):
    rng = np.random.default_rng(7)
    ds = random_records(rng, n_questions=16, num_relation=NUM_REL,
                        n_entities_max=16, n_facts_max=40,
                        num_entity_global=NUM_ENT)
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), 32))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel = random_rel_hidden(rng, NUM_REL + 1, 4, 32)
    cfg = Config(model=ModelConfig(entity_dim=16, num_iter=1, num_ins=2,
                                   num_gnn=2, linear_dropout=0.0),
                 train=TrainConfig(batch_size=8, test_batch_size=8, lr=5e-3,
                                   decay_rate=0.99,
                                   checkpoint_dir=str(tmp_path / tag)))
    return Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                   num_entity=NUM_ENT, num_kb_relation=NUM_REL,
                   rel_hidden=rel[0], rel_hidden_inv=rel[1],
                   rel_text_mask=rel[2], mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.e2e
def test_mesh_training_matches_single_device(tmp_path):
    single = build_trainer(tmp_path, mesh=None, tag="single")
    mesh = make_mesh(dp=4, tp=2)
    sharded = build_trainer(tmp_path, mesh=mesh, tag="mesh")

    losses_s, losses_m = [], []
    for _ in range(5):
        loss_s, _, _ = single.train_epoch()
        with mesh:
            loss_m, _, _ = sharded.train_epoch()
        losses_s.append(loss_s)
        losses_m.append(loss_m)
    np.testing.assert_allclose(losses_s, losses_m, rtol=1e-3)

    with mesh:
        ev_m = sharded.evaluate(sharded.test_data)
    ev_s = single.evaluate(single.test_data)
    np.testing.assert_allclose(ev_s, ev_m, rtol=1e-3)
