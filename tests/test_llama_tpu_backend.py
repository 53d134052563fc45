"""llama_tpu registry backend: byte tokenizer round trip, bundle load,
greedy generation through the kv-cache Decoder, registry resolution."""

import dataclasses
import json
import os

import numpy as np
import pytest


def test_byte_tokenizer_roundtrip():
    from gnn_rag_tpu.rag.llms.llama_tpu import ByteTokenizer

    tok = ByteTokenizer()
    s = "Based on the reasoning paths [INST] m.0012345 -> rel_4 </s>"
    ids = tok.encode(s)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == s
    assert tok.vocab_size == 259


def test_registry_resolves_llama_tpu():
    from gnn_rag_tpu.rag.llms import get_registed_model
    from gnn_rag_tpu.rag.llms.llama_tpu import LlamaTPU

    assert get_registed_model("llama_tpu") is LlamaTPU
    assert get_registed_model("tpu-reader") is LlamaTPU
    # plain llama still resolves to the HF backend
    from gnn_rag_tpu.rag.llms.hf_causal import Llama
    assert get_registed_model("llama-2-7b") is Llama


def test_llama_tpu_backend_generates(tmp_path):
    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.rag.llms.llama_tpu import LlamaTPU
    from gnn_rag_tpu.utils.checkpoint import save_pytree

    mcfg = LlamaConfig(vocab_size=259, dim=32, n_layers=2, n_heads=4,
                       n_kv_heads=4, intermediate=64, max_seq_len=128,
                       dtype="float32")
    model = LlamaLM(mcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    save_pytree(os.path.join(str(tmp_path), "checkpoint"), params)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(dataclasses.asdict(mcfg), f)

    @dataclasses.dataclass
    class Args:
        model_path: str = str(tmp_path)
        max_new_tokens: int = 8

    be = LlamaTPU(Args())
    be.prepare_for_inference()
    assert be.maximun_token == 128 - 8 - 8
    out = be.generate_sentence("what do they speak in jamaica?")
    assert isinstance(out, str)
    outs = be.generate_batch(["q one", "q two longer text"])
    assert len(outs) == 2


def test_llama_tpu_backend_int8_quant(tmp_path):
    """--quant int8 quantizes a full-precision bundle at load and still
    generates; outputs stay close to the fp backend on a short greedy run."""
    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.rag.llms.llama_tpu import LlamaTPU
    from gnn_rag_tpu.utils.checkpoint import save_pytree

    mcfg = LlamaConfig(vocab_size=259, dim=32, n_layers=2, n_heads=4,
                       n_kv_heads=4, intermediate=64, max_seq_len=128,
                       dtype="float32")
    model = LlamaLM(mcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    save_pytree(os.path.join(str(tmp_path), "checkpoint"), params)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(dataclasses.asdict(mcfg), f)

    @dataclasses.dataclass
    class Args:
        model_path: str = str(tmp_path)
        max_new_tokens: int = 4
        quant: str = "int8"

    be = LlamaTPU(Args())
    be.prepare_for_inference()
    out = be.generate_sentence("what do they speak in jamaica?")
    assert isinstance(out, str)
    # the decoder really runs the int8 tree
    import jax.numpy as jnp2
    leaves = jax.tree_util.tree_leaves(be.decoder.params)
    assert any(l.dtype == jnp2.int8 for l in leaves)


@pytest.mark.e2e
def test_llama_tpu_backend_speculative(tmp_path):
    """--draft_path: single-prompt generation goes through speculative
    decoding and matches the plain greedy backend exactly."""
    import jax
    import jax.numpy as jnp

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.rag.llms.llama_tpu import LlamaTPU
    from gnn_rag_tpu.utils.checkpoint import save_pytree

    def save_bundle(d, seed, layers):
        mcfg = LlamaConfig(vocab_size=259, dim=32, n_layers=layers,
                           n_heads=4, n_kv_heads=4, intermediate=64,
                           max_seq_len=128, dtype="float32")
        model = LlamaLM(mcfg)
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 8), jnp.int32))
        os.makedirs(d, exist_ok=True)
        save_pytree(os.path.join(d, "checkpoint"), params)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(mcfg), f)

    tdir, ddir = str(tmp_path / "t"), str(tmp_path / "d")
    save_bundle(tdir, 0, 2)
    save_bundle(ddir, 1, 1)

    @dataclasses.dataclass
    class Args:
        model_path: str = tdir
        max_new_tokens: int = 8
        draft_path: str = None

    plain = LlamaTPU(Args())
    plain.prepare_for_inference()
    spec = LlamaTPU(Args(draft_path=ddir))
    spec.prepare_for_inference()
    assert spec.spec is not None
    prompt = "what do they speak in jamaica?"
    assert spec.generate_sentence(prompt) == plain.generate_sentence(prompt)
