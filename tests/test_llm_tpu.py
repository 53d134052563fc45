"""TPU LLM stack: flash-attention parity, model forward, KV-cache decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rag_tpu.llm_tpu import flash_attention as fa
from gnn_rag_tpu.llm_tpu.generate import Decoder
from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM


def test_flash_attention_interpret_matches_reference():
    rng = np.random.default_rng(0)
    B, L, H, D = 2, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    out_flash, lse = fa._flash_fwd_impl(q, k, v, interpret=True)
    out_ref = fa._reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    # lse matches the dense logsumexp of the causal scores
    import jax
    scores = np.einsum("blhd,bshd->bhls", q, k) / np.sqrt(q.shape[-1])
    mask = np.tril(np.ones((q.shape[1], q.shape[1]), bool))
    scores = np.where(mask[None, None], scores, -1e30)
    ref_lse = np.asarray(jax.nn.logsumexp(scores, axis=-1))  # [B, H, L]
    got = np.asarray(lse).reshape(q.shape[0], q.shape[2], q.shape[1])
    np.testing.assert_allclose(got, ref_lse, rtol=2e-4, atol=2e-4)


def test_flash_attention_backward_matches_reference():
    """The Pallas dq/dk/dv kernels (block recompute from lse) must equal the
    dense-recompute autodiff oracle."""
    rng = np.random.default_rng(1)
    B, L, H, D = 2, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
    o, lse = fa._flash_fwd_impl(q, k, v, interpret=True)
    dq, dk, dv = fa._flash_bwd_impl(q, k, v, o, lse, g, interpret=True)
    rdq, rdk, rdv = fa.flash_attention_reference_bwd(q, k, v, g)
    for got, ref, name in ((dq, rdq, "dq"), (dk, rdk, "dk"), (dv, rdv, "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LlamaConfig.tiny(vocab_size=128, use_flash=False)
    model = LlamaLM(cfg)
    tokens = jnp.asarray(np.arange(16)[None, :] % 128, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    return cfg, model, params


def test_model_forward_shapes(tiny_lm):
    cfg, model, params = tiny_lm
    tokens = jnp.asarray(np.arange(16)[None, :] % 128, jnp.int32)
    logits, _ = model.apply(params, tokens)
    assert logits.shape == (1, 16, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_kv_cache_decode_matches_full_forward(tiny_lm):
    cfg, model, params = tiny_lm
    prompt = list(range(1, 9))
    tokens = jnp.asarray([prompt], jnp.int32)
    # full forward greedy continuation, recomputing from scratch each step
    seq = list(prompt)
    for _ in range(4):
        logits, _ = model.apply(params, jnp.asarray([seq], jnp.int32))
        seq.append(int(jnp.argmax(logits[0, -1])))
    expected = seq[len(prompt):]
    dec = Decoder(model, params, max_len=32)
    got = dec.greedy(prompt, max_new_tokens=4)
    assert got == expected


def test_beam_search_returns_scored_beams(tiny_lm):
    cfg, model, params = tiny_lm
    dec = Decoder(model, params, max_len=32)
    seqs, scores, norm = dec.beam_search(list(range(1, 6)), num_beams=3,
                                         max_new_tokens=5)
    assert len(seqs) == 3
    assert all(len(s) > 0 for s in seqs)
    assert scores.shape == (3,)
    np.testing.assert_allclose(norm.sum(), 1.0, rtol=1e-6)
    # beams sorted by score, best beam equals greedy for step-1-dominant LMs
    assert all(scores[i] >= scores[i + 1] for i in range(2))


def test_rope_condense_extends_positions(tiny_lm):
    from gnn_rag_tpu.llm_tpu.model import rope_frequencies
    pos = jnp.asarray([[0, 8, 16]], jnp.int32)
    cos1, _ = rope_frequencies(16, pos, 10000.0, 1.0)
    cos8, _ = rope_frequencies(16, pos // 8, 10000.0, 1.0)
    cos_c, _ = rope_frequencies(16, pos, 10000.0, 8.0)
    np.testing.assert_allclose(np.asarray(cos_c), np.asarray(cos8), rtol=1e-6)


def test_word_tokenizer_roundtrip(tmp_path):
    """Closed-vocab word tokenizer: in-vocab chunks are single tokens, OOV
    chunks fall back to byte tokens, decode is exact, save/load stable."""
    from gnn_rag_tpu.rag.llms.llama_tpu import WordTokenizer

    text = "[INST] what is rel 19 of seed? [/INST] m.0030373\nm.0040171"
    tok = WordTokenizer.from_texts([text])
    ids = tok.encode(text)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == text
    # entity is ONE token
    assert tok.vocab["m.0030373"] >= WordTokenizer._WORD0
    # OOV word falls back to utf-8 bytes, still reversible
    oov = "zzz.unseen ént"
    assert tok.decode(tok.encode(oov, add_bos=False)) == oov
    # persisted vocabulary keeps ids stable
    p = tmp_path / "vocab.json"
    tok.save(str(p))
    tok2 = WordTokenizer.load(str(p))
    assert tok2.encode(text) == ids
    assert tok2.vocab_size == tok.vocab_size


@pytest.mark.e2e
def test_tied_embeddings_model_and_loss():
    """tie_embeddings drops lm_head, logits come from the f32 embedding
    matmul, and the chunked completion loss matches the dense path."""
    import numpy as np

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
    from gnn_rag_tpu.llm_tpu.sft import chunked_completion_loss

    cfg = LlamaConfig(vocab_size=128, dim=32, n_layers=1, n_heads=2,
                      n_kv_heads=2, intermediate=64, max_seq_len=32,
                      tie_embeddings=True, use_flash=False,
                      dtype="bfloat16")
    m = LlamaLM(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    assert "lm_head" not in p["params"]
    logits, _ = m.apply(p, jnp.ones((2, 8), jnp.int32))
    assert logits.dtype == jnp.float32
    assert logits.shape == (2, 8, 128)

    toks = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 17)),
                       jnp.int32)
    mask = jnp.ones((2, 17), jnp.float32)
    l_ch = chunked_completion_loss(m, p, toks, mask, chunk=8)
    lg, _ = m.apply(p, toks[:, :-1])
    lp = jax.nn.log_softmax(lg, -1)
    nll = -jnp.take_along_axis(lp, toks[:, 1:, None], -1)[..., 0]
    l_d = (nll * mask[:, 1:]).sum() / mask[:, 1:].sum()
    assert abs(float(l_ch) - float(l_d)) < 1e-3


class TestSpeculativeDecoder:
    """Greedy speculative decoding: output must EXACTLY equal the target's
    greedy continuation, for any draft model."""

    def _mk(self, seed, vocab=64, dim=32, layers=2):
        import jax
        import jax.numpy as jnp

        from gnn_rag_tpu.llm_tpu.model import LlamaConfig, LlamaLM
        cfg = LlamaConfig(vocab_size=vocab, dim=dim, n_layers=layers,
                          n_heads=4, n_kv_heads=4, intermediate=64,
                          max_seq_len=256, dtype="float32")
        model = LlamaLM(cfg)
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 8), jnp.int32))
        return model, params

    # gamma=3 stays in the fast default suite: speculative EXACTNESS is a
    # layout-sensitive invariant that must gate every commit (ADVICE r4)
    @pytest.mark.parametrize("gamma", [
        pytest.param(1, marks=pytest.mark.e2e), 3,
        pytest.param(5, marks=pytest.mark.e2e)])
    def test_exact_match_independent_draft(self, gamma):
        from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder

        target, tp = self._mk(0)
        draft, dp = self._mk(1, layers=1)
        dec = Decoder(target, tp, max_len=256)
        spec = SpeculativeDecoder(target, tp, draft, dp, max_len=256,
                                  gamma=gamma)
        for prompt in ([5, 9, 13, 2, 7], list(range(1, 33))):
            want = dec.greedy(prompt, max_new_tokens=24)
            got = spec.greedy(prompt, max_new_tokens=24)
            assert got == want, (gamma, prompt[:4], got, want)

    @pytest.mark.e2e
    def test_self_draft_accepts_everything(self):
        """draft == target: every proposal agrees, so each round emits
        gamma+1 tokens with ONE target forward."""
        from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder

        target, tp = self._mk(0)
        dec = Decoder(target, tp, max_len=256)
        spec = SpeculativeDecoder(target, tp, target, tp, max_len=256,
                                  gamma=4)
        prompt = [3, 1, 4, 1, 5]
        want = dec.greedy(prompt, max_new_tokens=20)
        got = spec.greedy(prompt, max_new_tokens=20)
        assert got == want
        st = spec.last_stats
        # 20 tokens at 5/round -> 4 verify forwards (+1 prefill)
        assert st["target_forwards"] <= 1 + -(-20 // 5) + 1, st
        assert st["draft_accepted"] >= 16, st

    @pytest.mark.e2e
    def test_eos_stops_early(self):
        from gnn_rag_tpu.llm_tpu.generate import Decoder, SpeculativeDecoder

        target, tp = self._mk(0)
        draft, dp = self._mk(2, layers=1)
        dec = Decoder(target, tp, max_len=256)
        spec = SpeculativeDecoder(target, tp, draft, dp, max_len=256, gamma=3)
        prompt = [7, 7, 7, 7]
        want = dec.greedy(prompt, max_new_tokens=40)
        # pick the token the target emits at step 3 as "eos" and re-decode
        eos = want[2]
        want_eos = dec.greedy(prompt, max_new_tokens=40, eos_id=eos)
        got = spec.greedy(prompt, max_new_tokens=40, eos_id=eos)
        assert got == want_eos
