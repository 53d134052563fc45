"""LLM registry resolution + mesh-sharded SFT step."""

import jax
import numpy as np
import pytest

from gnn_rag_tpu.rag.llms import get_registed_model
from gnn_rag_tpu.rag.llms.hf_causal import Alpaca, Llama, Longchat
from gnn_rag_tpu.rag.llms.flan_t5 import FlanT5
from gnn_rag_tpu.rag.llms.mock import MockLLM
from gnn_rag_tpu.rag.llms.openai_chat import ChatGPT


def test_registry_substring_resolution():
    # reference semantics: substring match on the lowercased name
    assert get_registed_model("gpt-3.5-turbo") is ChatGPT
    assert get_registed_model("RoG") is Llama
    assert get_registed_model("rog-joint-v2") is Llama
    assert get_registed_model("my-llama-13b") is Llama
    assert get_registed_model("longchat-7b-16k") is Longchat
    assert get_registed_model("alpaca-lora") is Alpaca
    assert get_registed_model("flan-t5-xl") is FlanT5
    assert get_registed_model("mock") is MockLLM
    with pytest.raises(ValueError):
        get_registed_model("unknown-model")


def test_token_budgets_match_reference():
    # llama 4096-100, alpaca 2048-100, longchat 16384-100, flan-t5 512-5
    class A:
        max_new_tokens = 8
        dtype = "fp32"
        model_path = "x"
    assert Llama(A()).maximun_token == 4096 - 100
    assert Alpaca(A()).maximun_token == 2048 - 100
    assert Longchat(A()).maximun_token == 16384 - 100
    assert FlanT5(A()).maximun_token == 512 - 5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.e2e
def test_sft_step_on_mesh(tmp_path):
    from gnn_rag_tpu.llm_tpu.model import LlamaConfig
    from gnn_rag_tpu.llm_tpu.sft import SFTConfig, SFTTrainer
    from gnn_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    cfg = SFTConfig(output_dir=str(tmp_path), batch_size=8, total_steps=4,
                    save_every=100, learning_rate=1e-3)
    trainer = SFTTrainer(LlamaConfig.tiny(vocab_size=64), cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 60, (16, 24)).astype(np.int32)
    mask = np.ones((16, 24), np.float32)
    with mesh:
        losses = trainer.train(tokens, mask, steps=4, resume=False)
    assert len(losses) == 4
    assert all(np.isfinite(l) for l in losses)
