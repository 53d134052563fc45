"""Full two-stage pipeline: train the GNN retriever, export the .info
contract file, read with the (mock) LLM over extracted reasoning paths, and
score — the complete GNN-RAG flow of the reference
(gnn train/eval -> llm/results/gnn/<d>/test.info -> predict_answer.py)."""

import json

import numpy as np
import pytest

from gnn_rag_tpu.config import Config, ModelConfig, TrainConfig
from gnn_rag_tpu.rag.evaluate_results import eval_result
from gnn_rag_tpu.rag.predict import PredictConfig, predict_answers
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import random_records, random_rel_hidden

NUM_REL = 8
NUM_ENT = 1000


@pytest.mark.e2e
def test_gnn_to_rag_pipeline(tmp_path):
    rng = np.random.default_rng(3)
    ds = random_records(rng, n_questions=12, num_relation=NUM_REL,
                        n_entities_max=14, n_facts_max=36,
                        num_entity_global=NUM_ENT)
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), 32))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, 4, 32)
    id2entity = {i: f"m.{i:05d}" for i in range(NUM_ENT)}

    # ---- stage 1: train the retriever and export test.info ----
    cfg = Config(model=ModelConfig(entity_dim=16, num_iter=2, num_ins=2,
                                   num_gnn=2, linear_dropout=0.0),
                 train=TrainConfig(batch_size=6, test_batch_size=6, lr=5e-3,
                                   decay_rate=0.99,
                                   checkpoint_dir=str(tmp_path)))
    tr = Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                 num_entity=NUM_ENT, num_kb_relation=NUM_REL,
                 rel_hidden=rel_h, rel_hidden_inv=rel_hinv,
                 rel_text_mask=rel_mask, id2entity=id2entity)
    for _ in range(15):
        tr.train_epoch()
    gnn_dir = tmp_path / "gnn"
    gnn_dir.mkdir()
    f1, hit, em = tr.evaluate(ds, write_info=True,
                              info_path=str(gnn_dir / "test.info"))
    assert hit > 0.5  # the planted 1-hop rule is learned

    # ---- handoff: sibling test.json with the LLM-side schema ----
    rel_names = {i: f"domain.type.rel{i}" for i in range(NUM_REL)}
    qa = []
    for r in ds.records:
        l2g = {i: id2entity[g] for i, g in enumerate(r.entity_gids)}
        graph = [[l2g[int(h)], rel_names[int(rl)], l2g[int(t)]]
                 for h, rl, t in zip(r.heads, r.rels, r.tails)
                 if int(rl) != NUM_REL - 1]  # drop self loops
        qa.append({"id": r.qid, "question": r.question,
                   "answer": [id2entity[a] for a in r.answer_gids],
                   "q_entity": [id2entity[int(r.entity_gids[s])]
                                for s in r.seed_locals],
                   "a_entity": [id2entity[a] for a in r.answer_gids],
                   "graph": graph, "choices": []})
    with open(gnn_dir / "test.json", "w") as f:
        for q in qa:
            f.write(json.dumps(q) + "\n")

    # ---- stage 2: RAG reading over the exported candidates ----
    out = predict_answers(PredictConfig(
        data_path=str(gnn_dir / "test.json"), model_name="mock",
        predict_path=str(tmp_path / "results"),
        prompt_path="prompts/llama2_predict.txt",
        rule_path_g1=str(gnn_dir / "test.info"), entities_names_path=None))
    preds = [json.loads(l) for l in open(out)]
    assert len(preds) == len(qa)
    summary = eval_result(out)
    metrics = dict(zip(summary.split()[::2], summary.split()[1::2]))
    # retrieval learned the rule; the mock reader echoes path tails,
    # so Hit must track retrieval quality
    assert float(metrics["Hit:"]) > 50.0, summary
