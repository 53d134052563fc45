"""Multi-hop evaluator: hop filtering, coverage, metrics."""

import json

from gnn_rag_tpu.rag.evaluate_multi_hop import eval_result_multi_hop

GRAPH = [["a", "r1", "b"], ["b", "r2", "c"], ["a", "r3", "d"]]


def test_multi_hop_filtering_and_coverage(tmp_path):
    # q1: answer c is 2 hops from a -> counted; q2: answer d is 1 hop -> skipped
    dataset = [
        {"id": "q1", "question": "two hop", "q_entity": ["a"],
         "a_entity": ["c"], "graph": GRAPH, "answer": ["c"]},
        {"id": "q2", "question": "one hop", "q_entity": ["a"],
         "a_entity": ["d"], "graph": GRAPH, "answer": ["d"]},
    ]
    pred_file = tmp_path / "predictions.jsonl"
    with open(pred_file, "w") as f:
        f.write(json.dumps({"id": "q1", "prediction": "c",
                            "ground_truth": ["c"],
                            "input": "Reasoning Paths: a -> r1 -> b -> r2 -> c"})
                + "\n")
        f.write(json.dumps({"id": "q2", "prediction": "wrong",
                            "ground_truth": ["d"], "input": "no paths here"})
                + "\n")
    res = eval_result_multi_hop(str(pred_file), dataset=dataset)
    assert res["n_multi_hop"] == 1       # only q1 has a >1-hop ground path
    assert res["hit"] == 100.0
    assert res["hit1"] == 100.0
    assert res["coverage"] == 1.0        # the answer string appears in input
