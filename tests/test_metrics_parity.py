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


def test_train_f1_device_matches_host():
    """The on-device training F1 (train_f1_device) must reproduce the host
    reference implementation (train_batch_f1) bit-for-bit on random batches,
    including the empty-answer / empty-retrieved / h1-gated edge cases."""
    import numpy as np

    from gnn_rag_tpu.train.metrics import train_batch_f1, train_f1_device

    rng = np.random.default_rng(0)
    B, E, pad_id = 16, 64, 10_000
    for trial in range(5):
        logits = rng.normal(size=(B, E)).astype(np.float32)
        pred = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        answer = (rng.random((B, E)) < 0.05).astype(np.float32)
        answer[0] = 0.0                       # no-answer sample
        seed = np.zeros((B, E), np.float32)
        seed[:, :2] = 0.5
        # unique gids per row (the g2l map is injective in real batches;
        # the host metric matches answers by global id, so duplicates would
        # legitimately diverge from per-slot matching)
        gids = np.stack([rng.choice(5000, size=E, replace=False)
                         for _ in range(B)])
        gids[:, -4:] = pad_id                 # padding slots
        h1 = (rng.random(B) < 0.7).astype(np.float32)
        eps = 0.95
        host = np.asarray(train_batch_f1(pred, answer, h1, gids, seed,
                                         pad_id, eps))
        dev = np.asarray(train_f1_device(pred, answer, h1, gids, seed,
                                         pad_id, eps))
        close = np.isclose(dev, host, rtol=1e-6, atol=1e-6)
        for b in np.nonzero(~close)[0]:
            # the only permitted divergence: the host accumulates the
            # cumulative candidate mass in float64, the device in float32 —
            # a candidate whose prefix mass lands within float32 eps of the
            # 0.95 cutoff may flip in/out of the retrieved set
            keep = (seed[b] == 0) & (gids[b] != pad_id)
            cand = np.sort(pred[b][keep & (pred[b] >= (1 - eps) / E)])[::-1]
            cum = np.cumsum(cand.astype(np.float64))
            assert np.min(np.abs(cum - eps)) < 1e-5, (
                f"trial {trial} sample {b}: {dev[b]} vs {host[b]} "
                "not a cutoff-boundary case")
