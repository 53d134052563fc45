"""End-to-end CLI: micro JSONL dataset on disk -> train 2 epochs -> eval
export, through the same entry a user would run."""

import json
import os

import numpy as np
import pytest


def write_micro_dataset(root):
    ents = [f"m.{i:03d}" for i in range(12)]
    rels = ["people.person.place_of_birth", "location.location.contains",
            "film.actor.film"]
    words = sorted({"who", "is", "where", "what", "born", "in", "contains",
                    "film", "of"})
    (root / "entities.txt").write_text("\n".join(ents) + "\n")
    (root / "relations.txt").write_text("\n".join(rels) + "\n")
    (root / "vocab.txt").write_text("\n".join(words) + "\n")

    rng = np.random.default_rng(0)
    questions = []
    for i in range(12):
        seed = ents[i % len(ents)]
        others = [e for e in ents if e != seed]
        answer = others[i % len(others)]
        tuples = [[seed, rels[i % 3], answer]]
        nodes = {seed, answer}
        for _ in range(6):
            h, t = rng.choice(ents, 2, replace=False)
            tuples.append([str(h), rels[int(rng.integers(3))], str(t)])
            nodes.update([str(h), str(t)])
        questions.append({
            "id": f"q{i}",
            "question": f"who is born in {i}",
            "entities": [seed],
            "subgraph": {"entities": sorted(nodes), "tuples": tuples},
            "answers": [{"kb_id": answer, "text": f"name{i}"}],
        })
    for split, sl in (("train", slice(0, 8)), ("dev", slice(8, 10)),
                      ("test", slice(10, 12))):
        with open(root / f"{split}.json", "w") as f:
            for q in questions[sl]:
                f.write(json.dumps(q) + "\n")


@pytest.mark.e2e
def test_cli_train_and_eval(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_micro_dataset(data_dir)
    ckpt_dir = tmp_path / "ckpt"

    from gnn_rag_tpu.cli import run
    run(["ReaRev", "--data_folder", str(data_dir) + "/",
         "--checkpoint_dir", str(ckpt_dir),
         "--experiment_name", "micro",
         "--lm", "sbert", "--entity_dim", "16",
         "--num_iter", "2", "--num_ins", "2", "--num_gnn", "2",
         "--num_epoch", "2", "--eval_every", "2",
         "--batch_size", "4", "--test_batch_size", "4",
         "--lr", "0.003", "--decay_rate", "0.98"])

    # checkpoints + logs exist
    names = os.listdir(ckpt_dir)
    assert any("final" in n for n in names), names

    # eval-only run exports the .info contract file
    run(["ReaRev", "--data_folder", str(data_dir) + "/",
         "--checkpoint_dir", str(ckpt_dir),
         "--experiment_name", "micro", "--is_eval",
         "--lm", "sbert", "--entity_dim", "16",
         "--num_iter", "2", "--num_ins", "2", "--num_gnn", "2",
         "--batch_size", "4", "--test_batch_size", "4"])
    info = ckpt_dir / "micro_test.info"
    assert info.exists()
    lines = [json.loads(l) for l in open(info)]
    assert len(lines) == 2
    assert {"question", "answers", "cand", "f1", "hit", "em"} <= set(lines[0])
