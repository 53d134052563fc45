"""Multi-device data-parallel evaluation on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import ModelConfig
from gnn_rag_tpu.models import ReaRev
from gnn_rag_tpu.parallel.mesh import make_mesh, make_sharded_forward
from gnn_rag_tpu.train.evaluate import Evaluator
from gnn_rag_tpu.utils.synthetic import random_records, random_rel_hidden

NUM_REL = 8
NUM_ENT = 1000


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.e2e
def test_sharded_eval_matches_single_device():
    rng = np.random.default_rng(4)
    ds = random_records(rng, n_questions=16, num_relation=NUM_REL,
                        n_entities_max=16, n_facts_max=40,
                        num_entity_global=NUM_ENT)
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), 32))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel = random_rel_hidden(rng, NUM_REL + 1, 4, 32)
    cfg = ModelConfig(entity_dim=16, num_iter=1, num_ins=2, num_gnn=1,
                      linear_dropout=0.0)
    model = ReaRev(cfg=cfg, num_entity=NUM_ENT, num_relation=NUM_REL)
    batch0 = ds.make_batch(ds.batch_indices(0, 8), batch_pad_to=8)
    params = model.init(jax.random.PRNGKey(0), batch0, *rel)

    evaluator = Evaluator(eps=0.95, num_entity=NUM_ENT, id2entity={},
                          num_iter=1)

    single = evaluator.evaluate(
        ds, lambda b: model.apply(params, b, *rel), test_batch_size=8)

    mesh = make_mesh(dp=8, tp=1)
    fwd = make_sharded_forward(model, params, rel, mesh)
    # dp requires the batch padded to the mesh size
    orig_make = ds.make_batch
    ds.make_batch = lambda idx, **kw: orig_make(
        idx, **{**kw, "batch_pad_to": 8})
    with mesh:
        sharded = evaluator.evaluate(ds, fwd, test_batch_size=8)
    ds.make_batch = orig_make

    np.testing.assert_allclose(single, sharded, rtol=1e-4)
