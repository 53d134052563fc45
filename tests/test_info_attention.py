"""Opt-in instruction-attention export in the .info artifact.

Default stays byte-parity with the shipped files (empty "0".."J-1" dicts,
evaluate.py:106-137 + tp_list=None at eval); with write_attention the slots
carry the instruction attention over question tokens."""

import json

import numpy as np
import pytest

from gnn_rag_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import random_records

NUM_REL = 8
NUM_ENT = 500


def make_trainer(tmp_path, model_name="ReaRev"):
    rng = np.random.default_rng(0)
    ds = random_records(rng, n_questions=8, num_relation=NUM_REL,
                        num_entity_global=NUM_ENT)
    cfg = Config(
        data=DataConfig(name="webqsp", data_folder=str(tmp_path)),
        model=ModelConfig(model_name=model_name, entity_dim=16, num_iter=2,
                          num_ins=2, num_gnn=1, num_step=2, num_layer=1,
                          linear_dropout=0.0, lm="sbert"),
        train=TrainConfig(num_epoch=1, batch_size=4, test_batch_size=4,
                          checkpoint_dir=str(tmp_path),
                          experiment_name="attn"))
    ds.q_hidden = [np.random.default_rng(1).standard_normal(
        (len(r.q_token_ids), 300)).astype(np.float32) for r in ds.records]
    return Trainer(cfg, train_data=None, valid_data=ds, test_data=ds,
                   num_entity=NUM_ENT, num_kb_relation=NUM_REL), ds


def test_info_attention_slots(tmp_path):
    trainer, ds = make_trainer(tmp_path)

    # default: empty per-iteration dicts (shipped-artifact parity)
    p0 = str(tmp_path / "plain.info")
    trainer.evaluate(ds, write_info=True, info_path=p0)
    rec = json.loads(open(p0).readline())
    assert rec["0"] == {} and rec["1"] == {}

    # opt-in: attention over the question's real tokens, normalised
    p1 = str(tmp_path / "attn.info")
    trainer.evaluate(ds, write_info=True, info_path=p1, write_attention=True)
    lines = [json.loads(l) for l in open(p1)]
    assert len(lines) == len(ds.records)
    for rec, r in zip(lines, ds.records):
        for j in ("0", "1"):
            att = rec[j]["attention"]
            assert len(att) == len(r.q_token_ids)
            assert sum(att) == pytest.approx(1.0, abs=1e-3)
    # metrics identical with and without the attention pass
    r0 = [json.loads(l)["f1"] for l in open(p0)]
    r1 = [l["f1"] for l in lines]
    assert r0 == r1


def test_graftnet_attention_guard(tmp_path):
    trainer, ds = make_trainer(tmp_path, model_name="GraftNet")
    assert trainer._eval_step_attn is None
    # write_attention silently degrades to the parity format
    p = str(tmp_path / "g.info")
    trainer.evaluate(ds, write_info=True, info_path=p, write_attention=True)
    rec = json.loads(open(p).readline())
    assert rec["0"] == {}
