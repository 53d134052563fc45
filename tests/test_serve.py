"""RetrieverService: question in -> candidates + verbalized paths out."""

import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from gnn_rag_tpu.config import Config, DataConfig, ModelConfig
from gnn_rag_tpu.data.vocab import Vocab
from gnn_rag_tpu.serve import RetrieverService
from gnn_rag_tpu.utils.synthetic import random_rel_hidden


@pytest.fixture(scope="module")
def service():
    ents = {f"m.{i:02d}": i for i in range(20)}
    rels = {"people.person.place_of_birth": 0, "location.location.contains": 1}
    vocab = Vocab(ents, rels, {})
    cfg = Config(data=DataConfig(name="webqsp"),
                 model=ModelConfig(entity_dim=16, num_iter=1, num_ins=2,
                                   num_gnn=1, linear_dropout=0.0))
    rng = np.random.default_rng(0)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, 3 + 1, 4, 32)

    def qenc(token_ids):
        r = np.random.default_rng(int(token_ids.sum()))
        return r.standard_normal((len(token_ids), 32)).astype(np.float32)

    svc = RetrieverService.__new__(RetrieverService)
    # initialise params against a real sample, then build the service
    from gnn_rag_tpu.data.loader import ingest_question, num_kb_relation
    sample = make_question()
    nkr = num_kb_relation(2, False, True)
    from gnn_rag_tpu.train.trainer import build_model
    model = build_model(cfg, 20, nkr)
    rec = ingest_question(sample, vocab, data_name="webqsp",
                          use_inverse_relation=False, use_self_loop=True,
                          num_kb_relation=nkr)
    from gnn_rag_tpu.data.loader import KGQADataset
    ds = KGQADataset([rec], num_entity=20, num_kb_relation=nkr)
    ds.q_hidden = [qenc(np.zeros(4, np.int32))]
    for r in ds.records:
        r.q_token_ids = np.zeros(4, np.int32)
    batch = ds.make_batch([0])
    params = model.init(jax.random.PRNGKey(0), batch, rel_h, rel_hinv, rel_mask)

    return RetrieverService(cfg, vocab, params, rel_hidden=rel_h,
                            rel_hidden_inv=rel_hinv, rel_text_mask=rel_mask,
                            question_encoder=qenc)


def make_question():
    return {
        "id": "q0",
        "question": "where was m00 born",
        "entities": ["m.00"],
        "subgraph": {
            "entities": [f"m.{i:02d}" for i in range(6)],
            "tuples": [
                ["m.00", "people.person.place_of_birth", "m.01"],
                ["m.01", "location.location.contains", "m.02"],
                ["m.03", "location.location.contains", "m.04"],
            ],
        },
        "answers": [],
    }


def test_retrieve_returns_candidates_and_paths(service):
    out = service.retrieve([make_question(), make_question()])
    assert len(out) == 2
    for res in out:
        assert len(res["cand"]) >= 1
        # candidates are (mid, prob) with probs descending
        probs = [p for _, p in res["cand"]]
        assert probs == sorted(probs, reverse=True)
        # every path is verbalized and reaches a candidate
        for p in res["paths"]:
            assert " -> " in p
            assert p.startswith("m.00")


def test_http_endpoint(service):
    httpd = service.serve_http(port=0)
    try:
        req = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=json.dumps({"questions": [make_question()]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            resp = json.loads(r.read())
        assert len(resp["results"]) == 1
        assert "cand" in resp["results"][0]
    finally:
        httpd.shutdown()


def test_path_backends_agree(service):
    """native / python / device backends produce the same path SET for the
    same questions; keep_parallel coerces the device backend away (it
    implements collapse semantics only)."""
    from gnn_rag_tpu import native as native_mod

    def rebuild(**kw):
        return RetrieverService(
            service.cfg, service.vocab, service.params,
            rel_hidden=service.rel_args[0], rel_hidden_inv=service.rel_args[1],
            rel_text_mask=service.rel_args[2],
            question_encoder=service.question_encoder, **kw)

    q = make_question()
    by_backend = {}
    backends = ["python", "device"]
    if native_mod.available():
        backends.append("native")
    for pb in backends:
        out = rebuild(path_backend=pb).retrieve([q])
        by_backend[pb] = sorted(out[0]["paths"])
    ref = by_backend["python"]
    for pb, paths in by_backend.items():
        assert paths == ref, pb

    svc_kp = rebuild(path_backend="device", keep_parallel=True)
    assert svc_kp.path_backend in ("native", "python")
    # parallel edge shows both relations under keep_parallel
    q2 = make_question()
    q2["subgraph"]["tuples"].append(
        ["m.00", "location.location.contains", "m.01"])
    out_kp = svc_kp.retrieve([q2])[0]["paths"]
    out_plain = rebuild(path_backend="python").retrieve([q2])[0]["paths"]
    assert any("people.person.place_of_birth | location.location.contains"
               in p for p in out_kp)
    assert not any(" | " in p for p in out_plain)


def test_auto_backend_prefers_fastest_available(service, monkeypatch):
    """'auto' orders backends by measured speed (BENCH path_extraction:
    native 371 > python 99 > device 11.9 q/s): native when the .so is
    present, else the python oracle — NEVER the experimental device BFS."""
    from gnn_rag_tpu import native as native_mod

    def rebuild(**kw):
        return RetrieverService(
            service.cfg, service.vocab, service.params,
            rel_hidden=service.rel_args[0], rel_hidden_inv=service.rel_args[1],
            rel_text_mask=service.rel_args[2],
            question_encoder=service.question_encoder, **kw)

    monkeypatch.setattr(native_mod, "available", lambda: False)
    assert rebuild(path_backend="auto").path_backend == "python"
    monkeypatch.setattr(native_mod, "available", lambda: True)
    assert rebuild(path_backend="auto").path_backend == "native"
    # explicit request still honoured
    assert rebuild(path_backend="device").path_backend == "device"


def test_qa_service_end_to_end(service):
    """QAService: question+subgraph in -> read answer out, one process.
    With the mock reader (echoes path tails), the prediction must contain
    the path-reachable candidate."""
    import argparse

    from gnn_rag_tpu.rag.llms.mock import MockLLM
    from gnn_rag_tpu.serve import QAService

    reader = MockLLM(argparse.Namespace(max_new_tokens=64))
    reader.prepare_for_inference()
    qa = QAService(service, reader)
    out = qa.answer([make_question()])
    assert len(out) == 1
    assert "Reasoning Paths:" in out[0]["prompt"]
    assert out[0]["cand"]
    # mock echoes path tails; m.01/m.02 are reachable from m.00
    assert any(t in out[0]["prediction"] for t in ("m.01", "m.02"))

    httpd = qa.serve_http(port=0)
    try:
        req = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/answer",
            data=json.dumps({"questions": [make_question()]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            resp = json.loads(r.read())
        assert resp["results"][0]["prediction"] == out[0]["prediction"]
        # /retrieve stays available on the same endpoint
        req2 = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=json.dumps({"questions": [make_question()]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=60) as r:
            resp2 = json.loads(r.read())
        assert "cand" in resp2["results"][0]
    finally:
        httpd.shutdown()


def test_http_malformed_body_returns_400(service):
    httpd = service.serve_http(port=0)
    try:
        req = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=b"{not json", headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        req2 = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=b"[1,2,3]", headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req2, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_http_handler_exception_returns_500(service):
    """A question the ingest path rejects must 500 with the reason, not
    drop the connection (which would also kill the worker thread)."""
    httpd = service.serve_http(port=0)
    try:
        bad = make_question()
        bad["subgraph"] = {"entities": [], "tuples": "not-a-list"}
        req = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=json.dumps({"questions": [bad]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 500
        # the server survives: a good request on the same service still works
        req2 = urllib.request.Request(
            f"http://localhost:{httpd.server_port}/retrieve",
            data=json.dumps({"questions": [make_question()]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=30) as r:
            assert "results" in json.loads(r.read())
    finally:
        httpd.shutdown()
