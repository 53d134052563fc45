"""Jitted batched decoding vs HuggingFace generate on the same weights.

Round-trips a tiny torch LLaMA through convert_hf and checks that the
device-side greedy and beam-search loops reproduce HF's sequences and
sequences_scores (the contract gen_rule_path.py:71-99 relies on)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=64, max_position_embeddings=128,
                           tie_word_embeddings=False, bos_token_id=1,
                           eos_token_id=2, pad_token_id=0)
    torch.manual_seed(3)
    tm = LlamaForCausalLM(hf_cfg)
    tm.eval()
    d = tmp_path_factory.mktemp("tiny_llama_dec")
    tm.save_pretrained(d)

    from gnn_rag_tpu.llm_tpu.convert_hf import load_hf_llama
    from gnn_rag_tpu.llm_tpu.generate import Decoder
    from gnn_rag_tpu.llm_tpu.model import LlamaLM

    params, cfg = load_hf_llama(str(d))
    cfg = dataclasses.replace(cfg, dtype="float32", use_flash=False)
    dec = Decoder(LlamaLM(cfg), params, max_len=128)
    return tm, dec


PROMPTS = [[1, 5, 9, 13], [1, 30, 31, 32, 33, 34], [1, 60]]


def hf_generate(tm, prompt, **kw):
    out = tm.generate(torch.tensor([prompt]),
                      pad_token_id=0, eos_token_id=2, **kw)
    return out


def test_greedy_batch_matches_hf(pair):
    tm, dec = pair
    ours = dec.greedy_batch(PROMPTS, max_new_tokens=12, eos_id=2)
    for p, o in zip(PROMPTS, ours):
        with torch.no_grad():
            ref = hf_generate(tm, p, max_new_tokens=12,
                              do_sample=False)[0].tolist()[len(p):]
        assert o == ref, (o, ref)


def test_beam_batch_matches_hf(pair):
    tm, dec = pair
    results = dec.beam_search_batch(PROMPTS, num_beams=3, max_new_tokens=10,
                                    eos_id=2)
    for p, (seqs, scores, norm) in zip(PROMPTS, results):
        with torch.no_grad():
            ref = tm.generate(torch.tensor([p]), max_new_tokens=10,
                              num_beams=3, num_return_sequences=3,
                              do_sample=False, output_scores=True,
                              return_dict_in_generate=True,
                              pad_token_id=0, eos_token_id=2)
        ref_seqs = [r.tolist()[len(p):] for r in ref.sequences]
        # strip HF right-padding after eos
        ref_seqs = [s[: s.index(2) + 1] if 2 in s else s for s in ref_seqs]
        ref_scores = ref.sequences_scores.numpy()
        assert seqs == ref_seqs, (seqs, ref_seqs)
        np.testing.assert_allclose(scores, ref_scores, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(norm.sum(), 1.0, rtol=1e-6)
