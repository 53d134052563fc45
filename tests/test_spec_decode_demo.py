"""scripts/spec_decode_demo.py end-to-end on CPU with tiny random bundles.

Covers the study harness itself (prompt building, bundle loading, the
plain-vs-speculative timing loop, parity accounting, JSON artifact) so the
on-chip run only pays compile time, and the `--vocab_from` contract in
train_reader.py that makes draft/target vocabularies shareable."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))
from test_cli_e2e import write_micro_dataset  # noqa: E402


def _save_bundle(out, tok, dim, layers, seed, max_seq=192):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.utils.checkpoint import save_pytree

    cfg = LlamaConfig(vocab_size=tok.vocab_size, dim=dim, n_layers=layers,
                      n_heads=2, n_kv_heads=2, intermediate=64,
                      max_seq_len=max_seq, tie_embeddings=True,
                      dtype="float32")
    model = LlamaLM(cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 8), jnp.int32))
    os.makedirs(out, exist_ok=True)
    save_pytree(os.path.join(out, "checkpoint"), params)
    tok.save(os.path.join(out, "vocab.json"))
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)


@pytest.mark.e2e
def test_spec_decode_demo_end_to_end(tmp_path, monkeypatch):
    from gnn_rag_tpu.rag.llms.llama_tpu import WordTokenizer

    data = tmp_path / "data"
    data.mkdir()
    write_micro_dataset(data)

    # one shared vocabulary — the --vocab_from serving contract
    words = []
    for fname in ("entities.txt", "relations.txt", "vocab.txt"):
        words += (data / fname).read_text().split()
    tok = WordTokenizer(sorted(set(words)) + [" ", "\n"])

    tdir, ddir = tmp_path / "target", tmp_path / "draft"
    _save_bundle(str(tdir), tok, dim=32, layers=2, seed=0)
    _save_bundle(str(ddir), tok, dim=16, layers=1, seed=1)

    import spec_decode_demo

    out = tmp_path / "spec.json"
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    monkeypatch.setattr(sys, "argv", [
        "spec_decode_demo.py", "--target", str(tdir), "--draft", str(ddir),
        "--data", str(data), "--split", "test", "--n", "2",
        "--gammas", "1,3", "--max_new", "6", "--out", str(out)])
    spec_decode_demo.main()

    res = json.loads(out.read_text())
    assert res["n_prompts"] == 2
    assert res["target"]["params_m"] >= res["draft"]["params_m"]
    assert [r["gamma"] for r in res["sweep"]] == [1, 3]
    for row in res["sweep"]:
        # the decoder's exactness contract, aggregated by the harness
        assert row["greedy_parity_mismatches"] == 0
        assert row["tokens"] > 0 and row["tok_per_s"] > 0
        assert 0.0 <= row["acceptance_rate"] <= 1.0


def test_vocab_mismatch_is_rejected(tmp_path, monkeypatch):
    from gnn_rag_tpu.rag.llms.llama_tpu import WordTokenizer

    data = tmp_path / "data"
    data.mkdir()
    write_micro_dataset(data)
    tok_a = WordTokenizer(["alpha", "beta", " "])
    tok_b = WordTokenizer(["alpha", "beta", "gamma", " "])
    tdir, ddir = tmp_path / "t", tmp_path / "d"
    _save_bundle(str(tdir), tok_a, dim=16, layers=1, seed=0)
    _save_bundle(str(ddir), tok_b, dim=16, layers=1, seed=1)

    import spec_decode_demo

    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    monkeypatch.setattr(sys, "argv", [
        "spec_decode_demo.py", "--target", str(tdir), "--draft", str(ddir),
        "--data", str(data), "--n", "1", "--gammas", "1",
        "--out", str(tmp_path / "x.json")])
    with pytest.raises(AssertionError, match="vocab_from"):
        spec_decode_demo.main()
