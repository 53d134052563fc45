"""Golden parity: our retrieval metrics reproduce the per-question values in
the reference's shipped `.info` files (llm/results/gnn/*/test.info)."""

import json
import os

import pytest

from conftest import REFERENCE_DIR, reference_available
from gnn_rag_tpu.train.metrics import f1_and_hits_eval

INFO_FILES = [
    "llm/results/gnn/RoG-webqsp/rearev-sbert/test.info",
    "llm/results/gnn/RoG-cwq/rearev-sbert/test.info",
]


@pytest.mark.parametrize("rel_path", INFO_FILES)
def test_f1_and_hits_matches_shipped_info(rel_path):
    path = os.path.join(REFERENCE_DIR, rel_path)
    if not os.path.exists(path):
        pytest.skip("reference .info not available")
    n_checked = 0
    with open(path) as f:
        for i, line in enumerate(f):
            if i >= 500:
                break
            obj = json.loads(line)
            cand = [(c, p) for c, p in obj["cand"]]
            answers = obj["answers"]
            p, r, f1, hit, em, _case, retrieved = f1_and_hits_eval(
                answers, cand, eps=0.95)
            assert abs(p - obj["precison"]) < 1e-9, (i, p, obj["precison"])
            assert abs(r - obj["recall"]) < 1e-9, (i, r, obj["recall"])
            assert abs(f1 - obj["f1"]) < 1e-9, (i, f1, obj["f1"])
            assert hit == obj["hit"], i
            assert em == obj["em"], i
            # the retrieved list must reproduce the shipped candidate list
            assert [c for c, _ in retrieved] == [c for c, _ in obj["cand"]], i
            n_checked += 1
    assert n_checked > 100
