"""Weight-only int8 serving path: numerics, decode, and size."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
from gnn_rag_tpu.llm_tpu.quant import (param_bytes, quantize_kernel,
                                       quantize_params)


def _models(tie=False, vocab=512):
    cfg = LlamaConfig.tiny(vocab_size=vocab, tie_embeddings=tie)
    cfg_q = dataclasses.replace(cfg, quant="int8")
    model = LlamaLM(cfg)
    model_q = LlamaLM(cfg_q)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, vocab, (2, 24)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    return model, model_q, params, tokens


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    q, scale = quantize_kernel(w)
    assert q.dtype == jnp.int8 and scale.shape == (48,)
    w_hat = q.astype(jnp.float32) * scale
    # per-channel symmetric int8: worst-case error is scale/2 per element
    err = np.abs(np.asarray(w_hat - w))
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


@pytest.mark.e2e
def test_int8_logits_close_and_smaller():
    model, model_q, params, tokens = _models()
    qparams = quantize_params(params)
    logits, _ = model.apply(params, tokens)
    logits_q, _ = model_q.apply(qparams, tokens)
    l, lq = np.asarray(logits, np.float64), np.asarray(logits_q, np.float64)
    cos = (l * lq).sum() / (np.linalg.norm(l) * np.linalg.norm(lq))
    assert cos > 0.999, cos
    # greedy argmax agreement on the vast majority of positions
    agree = (l.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 0.9, agree
    # projection kernels are 4x smaller (int8 vs f32) -> whole tree shrinks
    assert param_bytes(qparams) < 0.55 * param_bytes(params)


def test_int8_tied_embeddings_variant():
    model, model_q, params, tokens = _models(tie=True)
    qparams = quantize_params(params)
    logits, _ = model.apply(params, tokens)
    logits_q, _ = model_q.apply(qparams, tokens)
    l, lq = np.asarray(logits, np.float64), np.asarray(logits_q, np.float64)
    cos = (l * lq).sum() / (np.linalg.norm(l) * np.linalg.norm(lq))
    assert cos > 0.999, cos


@pytest.mark.e2e
def test_int8_kv_cache_decode():
    """The quantized model decodes through the jitted kv-cache Decoder and
    produces the same greedy continuation as full precision on a short run
    (random tiny weights: argmax chains can diverge late, so compare a
    handful of steps)."""
    from gnn_rag_tpu.llm_tpu.generate import Decoder

    model, model_q, params, tokens = _models(vocab=128)
    qparams = quantize_params(params)
    prompts = [list(range(1, 9)), list(range(3, 17))]
    dec = Decoder(model, params, max_len=40)
    dec_q = Decoder(model_q, qparams, max_len=40)
    out = dec.greedy_batch(prompts, max_new_tokens=4)
    out_q = dec_q.greedy_batch(prompts, max_new_tokens=4)
    match = np.mean([a == b for s, sq in zip(out, out_q)
                     for a, b in zip(s, sq)])
    assert match >= 0.5, (out, out_q)


@pytest.mark.e2e
def test_int8_target_speculative_composes():
    """int8 target + full-precision draft: speculative output must equal
    the int8 target's own greedy decode (the two serving levers compose)."""
    from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder

    model, model_q, params, tokens = _models(vocab=128)
    qparams = quantize_params(params)
    draft_cfg = dataclasses.replace(model.cfg, n_layers=1)
    from gnn_rag_tpu.llm_tpu.model import LlamaLM
    draft = LlamaLM(draft_cfg)
    dparams = draft.init(jax.random.PRNGKey(7),
                         jnp.asarray(np.zeros((1, 8), np.int32)))
    dec_q = Decoder(model_q, qparams, max_len=96)
    spec = SpeculativeDecoder(model_q, qparams, draft, dparams,
                              max_len=96, gamma=3)
    prompt = [5, 2, 8, 1]
    want = dec_q.greedy(prompt, max_new_tokens=16)
    got = spec.greedy(prompt, max_new_tokens=16)
    assert got == want
