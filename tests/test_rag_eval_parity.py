"""Golden parity: our answer scorer reproduces the reference's shipped
eval_result.txt from its shipped predictions.jsonl (numeric match to 1e-9;
the absolute digits differ only in float summation noise)."""

import os
import shutil

import pytest

from conftest import REFERENCE_DIR
from gnn_rag_tpu.rag.evaluate_results import eval_result

RUN_DIRS = [
    "llm/results/KGQA-GNN-RAG/rearev-sbert/RoG-webqsp/RoG/test/"
    "results_gen_rule_path_RoG-webqsp_RoG_test_predictions_3_False_jsonl/False",
    "llm/results/KGQA-GNN-RAG/rearev-lmsr/RoG-webqsp/RoG/test/"
    "results_gen_rule_path_RoG-webqsp_RoG_test_predictions_3_False_jsonl/False",
]


@pytest.mark.parametrize("run_dir", RUN_DIRS)
def test_eval_result_matches_shipped(run_dir, tmp_path):
    src = os.path.join(REFERENCE_DIR, run_dir)
    if not os.path.exists(os.path.join(src, "predictions.jsonl")):
        pytest.skip("shipped predictions not available")
    pred = tmp_path / "predictions.jsonl"
    shutil.copy(os.path.join(src, "predictions.jsonl"), pred)
    summary = eval_result(str(pred))
    with open(os.path.join(src, "eval_result.txt")) as f:
        expected = f.read().strip()

    def parse(s):
        toks = s.split()
        return {toks[i].rstrip(":"): float(toks[i + 1])
                for i in range(0, len(toks), 2)}

    got, exp = parse(summary), parse(expected)
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, (k, got[k], exp[k])
