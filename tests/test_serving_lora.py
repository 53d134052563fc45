"""Local OpenAI-protocol serving + LoRA adapters."""

import contextlib

import numpy as np
import optax
import pytest


def test_serving_roundtrip():
    from gnn_rag_tpu.rag.llms.mock import MockLLM
    from gnn_rag_tpu.rag.llms.serving import LLMProxy, OpenAIProtocolServer

    class Args:
        max_new_tokens = 16

    backend = MockLLM(Args())
    server = OpenAIProtocolServer(backend, model_name="mock", port=0).start()
    try:
        proxy = LLMProxy(port=server.port, model_name="mock")
        prompt = ("Reasoning Paths:\nJamaica -> lang -> English\n\n"
                  "Question:\nwhat do they speak?")
        out = proxy.query(prompt, max_retry=1)
        assert out == "English"
    finally:
        server.stop()


def test_lora_no_op_at_init_and_trains():
    import jax
    import jax.numpy as jnp
    from gnn_rag_tpu.llm_tpu.lora import (init_lora, lora_train_step_factory,
                                          merge_lora)
    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM

    cfg = LlamaConfig.tiny(vocab_size=64)
    model = LlamaLM(cfg)
    tokens = jnp.asarray(np.arange(12)[None, :] % 64, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    lora = init_lora(params, jax.random.PRNGKey(1), r=4)
    assert len(lora) == 2 * cfg.n_layers  # q_proj + v_proj per layer

    # B=0 init: merged == base
    merged = merge_lora(params, lora, alpha=16, r=4)
    l0, _ = model.apply(params, tokens)
    l1, _ = model.apply(merged, tokens)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)

    # adapter-only training reduces loss; base params untouched
    rng = np.random.default_rng(0)
    toks = rng.integers(1, 60, (8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.float32)
    tx = optax.adam(1e-2)
    opt_state = tx.init(lora)
    step = lora_train_step_factory(model, params, tx, alpha=16, r=4)
    losses = []
    for _ in range(30):
        lora, opt_state, loss = step(lora, opt_state, jnp.asarray(toks),
                                     jnp.asarray(mask))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


@pytest.mark.e2e
def test_lora_composes_with_tp_mesh():
    """LoRA adapter training on TP/DP-sharded base params (r1 gap: each was
    tested separately). Base weights live sharded on a dp2 x tp4 mesh; the
    adapters stay replicated; the merged W + AB step must run under GSPMD
    and match the unsharded LoRA step numerically."""
    import jax
    import jax.numpy as jnp
    from gnn_rag_tpu.llm_tpu.lora import init_lora, lora_train_step_factory
    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.llm_tpu.sharding import shard_llm_params
    from gnn_rag_tpu.parallel.mesh import make_mesh

    cfg = LlamaConfig.tiny(vocab_size=64)
    model = LlamaLM(cfg)
    tokens = jnp.asarray(np.arange(12)[None, :] % 64, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    lora0 = init_lora(params, jax.random.PRNGKey(1), r=4)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 60, (8, 16)).astype(np.int32))
    mask = jnp.ones((8, 16), jnp.float32)

    def run(base_params, mesh):
        tx = optax.adam(1e-2)
        lora = jax.tree_util.tree_map(jnp.copy, lora0)
        opt_state = tx.init(lora)
        step = lora_train_step_factory(model, base_params, tx, alpha=16, r=4)
        losses = []
        ctx = mesh if mesh is not None else contextlib.nullcontext()
        with ctx:
            for _ in range(5):
                lora, opt_state, loss = step(lora, opt_state, toks, mask)
                losses.append(float(loss))
        return losses

    ref_losses = run(params, None)
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_llm_params(mesh, params)
    tp_losses = run(sharded, mesh)
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-4, atol=1e-5)
    assert tp_losses[-1] < tp_losses[0], tp_losses
