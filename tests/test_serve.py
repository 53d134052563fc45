"""RetrieverService: question in -> candidates + verbalized paths out."""

import json
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
