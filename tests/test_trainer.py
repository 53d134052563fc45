"""End-to-end: tiny ReaRev trains on a synthetic fixture, loss drops, the
evaluator writes a structurally valid .info file, checkpoints round-trip."""

import json
import os

import numpy as np
import pytest

from gnn_rag_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import random_records, random_rel_hidden

NUM_REL = 8
WORD_DIM = 32


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    rng = np.random.default_rng(7)
    ds = random_records(rng, n_questions=16, num_relation=NUM_REL,
                        n_entities_max=16, n_facts_max=40)
    # deterministic per-question frozen-LM states
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), WORD_DIM))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 4, WORD_DIM)
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    cfg = Config(
        data=DataConfig(),
        model=ModelConfig(entity_dim=16, num_iter=2, num_ins=2, num_gnn=2,
                          linear_dropout=0.0, eps=0.95),
        train=TrainConfig(batch_size=8, test_batch_size=8, lr=5e-3,
                          decay_rate=0.99, checkpoint_dir=ckpt_dir,
                          experiment_name="synthetic"),
    )
    tr = Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                 num_entity=1000, num_kb_relation=NUM_REL,
                 rel_hidden=rel_h, rel_hidden_inv=rel_hinv,
                 rel_text_mask=rel_mask,
                 id2entity={i: f"m.{i:05d}" for i in range(1000)})
    return tr


@pytest.mark.e2e
def test_loss_decreases(trainer):
    loss0, _, _ = trainer.train_epoch()
    for _ in range(14):
        loss, h1, f1 = trainer.train_epoch()
    assert loss < loss0 * 0.7, (loss0, loss)
    assert np.mean(h1) > 0.5  # the planted 1-hop rule is learnable


def test_evaluator_writes_info(trainer, tmp_path):
    info_path = str(tmp_path / "test.info")
    f1, hit, em = trainer.evaluate(trainer.test_data, write_info=True,
                                   info_path=info_path)
    assert 0.0 <= f1 <= 1.0 and 0.0 <= hit <= 1.0
    lines = open(info_path).read().strip().split("\n")
    assert len(lines) == trainer.test_data.num_data
    obj = json.loads(lines[0])
    for key in ("question", "answers", "precison", "recall", "f1", "hit",
                "em", "cand", "0", "1"):
        assert key in obj, key
    assert all(isinstance(c, list) and len(c) == 2 for c in obj["cand"])
    # candidate mids are entity names via id2entity
    if obj["cand"]:
        assert obj["cand"][0][0].startswith("m.")


def test_checkpoint_roundtrip(trainer):
    import jax
    trainer.save_ckpt("h1")
    before = jax.tree_util.tree_leaves(trainer.params)[0].copy()
    trainer.load_ckpt(trainer._ckpt_path("h1"))
    after = jax.tree_util.tree_leaves(trainer.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_evaluator_entity_names_mapping(tmp_path):
    """'sr-' dataset mode maps candidate ids through the name table
    (evaluate.py:81-86)."""
    from gnn_rag_tpu.train.evaluate import Evaluator
    ev = Evaluator(eps=0.95, num_entity=100,
                   id2entity={i: i for i in range(100)},
                   entity_names=[f"name{i}" for i in range(100)], num_iter=1)
    assert ev._name(7) == "name7"
    ev2 = Evaluator(eps=0.95, num_entity=100,
                    id2entity={7: "m.7"}, num_iter=1)
    assert ev2._name(7) == "m.7"


def test_partial_checkpoint_load(tmp_path):
    """strict=False parity: a checkpoint missing keys (or with extra keys)
    still loads the overlapping leaves (train_model.py:252)."""
    import numpy as np
    from gnn_rag_tpu.utils.checkpoint import load_pytree, save_pytree
    full = {"params": {"a": np.ones((2, 2)), "b": np.zeros(3),
                       "new_layer": np.full(4, 7.0)}}
    old = {"params": {"a": np.full((2, 2), 5.0), "b": np.full(3, 9.0)}}
    path = str(tmp_path / "old.ckpt")
    save_pytree(path, old)
    merged = load_pytree(path, full, partial=True)
    np.testing.assert_allclose(np.asarray(merged["params"]["a"]),
                               np.full((2, 2), 5.0))
    np.testing.assert_allclose(np.asarray(merged["params"]["b"]),
                               np.full(3, 9.0))
    np.testing.assert_allclose(np.asarray(merged["params"]["new_layer"]),
                               np.full(4, 7.0))  # kept from target


def test_evaluate_best_runs(trainer):
    trainer.save_ckpt("h1")
    trainer.save_ckpt("f1")
    trainer.save_ckpt("final")
    trainer.evaluate_best()  # loads all three and evaluates without error
