"""scripts/serve_qa.py: checkpoint -> HTTP QA service in one command."""

import pytest
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from test_cli_e2e import write_micro_dataset  # noqa: E402


@pytest.mark.e2e
def test_serve_qa_entrypoint(tmp_path):
    data = tmp_path / "d"
    data.mkdir()
    write_micro_dataset(data)
    ck = str(tmp_path / "c")

    from gnn_rag_tpu.cli import run
    run(["ReaRev", "--data_folder", str(data) + "/", "--checkpoint_dir", ck,
         "--experiment_name", "m", "--lm", "sbert", "--entity_dim", "16",
         "--num_iter", "1", "--num_ins", "1", "--num_gnn", "1",
         "--num_epoch", "1", "--eval_every", "2", "--batch_size", "4",
         "--test_batch_size", "4", "--lr", "0.003"])

    import serve_qa
    httpd = serve_qa.main(
        ["ReaRev", "--data_folder", str(data) + "/", "--checkpoint_dir", ck,
         "--experiment_name", "m2", "--load_experiment", "m-final.ckpt",
         "--lm", "sbert", "--entity_dim", "16", "--num_iter", "1",
         "--num_ins", "1", "--num_gnn", "1", "--port", "0",
         "--reader", "mock"], block=False)
    try:
        q = {"question": "who is born in 3", "entities": ["m.003"],
             "subgraph": {
                 "entities": ["m.003", "m.004", "m.005"],
                 "tuples": [
                     ["m.003", "people.person.place_of_birth", "m.004"],
                     ["m.004", "location.location.contains", "m.005"]]},
             "answers": []}
        results = {}
        for route in ("/retrieve", "/answer"):
            req = urllib.request.Request(
                f"http://localhost:{httpd.server_port}{route}",
                data=json.dumps({"questions": [q]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results[route] = json.loads(r.read())["results"][0]
        assert results["/retrieve"]["cand"]
        assert any(p.startswith("m.003 ->")
                   for p in results["/retrieve"]["paths"])
        # mock reader echoes path tails: reachable entities come back
        assert "m.004" in results["/answer"]["prediction"]
    finally:
        httpd.shutdown()
