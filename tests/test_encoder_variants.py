"""Encoder-variant parity vs the real torch forwards.

The reference's --lm choices beyond the BERT family (bert_encoder.py:29-59):
roberta (pad-aware positions), t5 (T5 encoder stack, used via .encoder),
sbert2 (MPNet). Each variant's flax module + weight import must match the
HF torch activations on non-pad positions to 1e-4. simcse/relbert are BERT
checkpoints and are covered by the BERT parity test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from gnn_rag_tpu.models.frozen_lm import FrozenLM  # noqa: E402


def roundtrip(model, tmp_path, tokens, mask):
    model.eval()
    model.save_pretrained(tmp_path)
    lm = FrozenLM.from_hf(str(tmp_path))
    ours = lm.encode(np.where(mask > 0, tokens, 0).astype(np.int32),
                     mask=mask.astype(np.float32))
    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(tokens).long(),
            attention_mask=torch.from_numpy(mask).long()
        ).last_hidden_state.numpy()
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], theirs[valid],
                               rtol=1e-4, atol=1e-4)
    return lm


def make_inputs(vocab, pad_rows=True):
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, vocab, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    if pad_rows:
        mask[0, 7:] = 0
        mask[2, 4:] = 0
    return tokens, mask


def test_roberta_parity(tmp_path):
    from transformers import RobertaConfig, RobertaModel
    cfg = RobertaConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=52, pad_token_id=1)
    torch.manual_seed(0)
    model = RobertaModel(cfg)
    tokens, mask = make_inputs(100)
    tokens[mask == 0] = 1   # roberta pad id
    lm = roundtrip(model, tmp_path, tokens, mask)
    assert lm.module.position_style == "roberta"


def test_t5_encoder_parity(tmp_path):
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(vocab_size=80, d_model=32, num_layers=2, num_heads=4,
                   d_kv=8, d_ff=64)
    torch.manual_seed(0)
    model = T5EncoderModel(cfg)
    tokens, mask = make_inputs(80)
    lm = roundtrip(model, tmp_path, tokens, mask)
    from gnn_rag_tpu.models.encoder_variants import T5Encoder
    assert isinstance(lm.module, T5Encoder)


def test_mpnet_parity(tmp_path):
    from transformers import MPNetConfig, MPNetModel
    cfg = MPNetConfig(vocab_size=90, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=60)
    torch.manual_seed(0)
    model = MPNetModel(cfg)
    tokens, mask = make_inputs(90)
    tokens[mask == 0] = 1   # mpnet pad id
    lm = roundtrip(model, tmp_path, tokens, mask)
    from gnn_rag_tpu.models.encoder_variants import MPNetEncoder
    assert isinstance(lm.module, MPNetEncoder)
