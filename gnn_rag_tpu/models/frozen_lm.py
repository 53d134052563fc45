"""Frozen question/relation LM encoding outside the train step.

The reference runs its frozen SBERT inside every forward
(bert_encoder.py:89-109 with lm_frozen=1 freezing, :80-83) and encodes all
relation texts once at startup (base_model.py:168-176). Here the frozen
encoder runs ONCE over questions and relations at ingest, and the train step
consumes precomputed hidden states — removing a BERT forward from the hot
loop with identical semantics.

Weight sources, in order of preference:
1. HuggingFace checkpoint converted via utils.hf_import (when the model files
   are available locally);
2. deterministic random init (offline tests / synthetic benchmarks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encoders import TransformerQuestionEncoder


class FrozenLM:
    def __init__(self, word_dim: int = 384, vocab_size: int = 30522,
                 layers: int = 6, heads: int = 12, intermediate: Optional[int] = None,
                 max_len: int = 512, seed: int = 0, params=None, module=None):
        self.module = module or TransformerQuestionEncoder(
            vocab_size=vocab_size, hidden=word_dim, layers=layers, heads=heads,
            intermediate=intermediate or 4 * word_dim, max_len=max_len)
        if params is None:
            dummy_tok = jnp.zeros((1, 8), jnp.int32)
            dummy_mask = jnp.ones((1, 8), jnp.float32)
            # jitted init: the eager flax init dispatches every op separately
            # (~20s for the 6-layer encoder; worse through the TPU tunnel)
            params = jax.jit(self.module.init)(jax.random.PRNGKey(seed),
                                               dummy_tok, dummy_mask)
        self.params = params
        self.weight_source = "unspecified"
        self._fwd = jax.jit(lambda tok, mask: self.module.apply(self.params, tok, mask))

    @classmethod
    def from_hf(cls, lm: str, **kw) -> "FrozenLM":
        """Load a local HF torch checkpoint into the matching flax encoder.
        Dispatches on architecture (bert family / roberta / t5 / mpnet —
        the reference's seven --lm variants, bert_encoder.py:29-59).
        Raises when assets are unavailable."""
        from ..utils.hf_import import load_hf_encoder
        params, dims = load_hf_encoder(lm)
        arch = dims.get("arch", "bert")
        if arch == "t5":
            from .encoder_variants import T5Encoder
            module = T5Encoder(
                vocab_size=dims["vocab"], hidden=dims["hidden"],
                layers=dims["layers"], heads=dims["heads"],
                head_dim=dims["head_dim"], intermediate=dims["intermediate"],
                num_buckets=dims["num_buckets"],
                max_distance=dims["max_distance"], eps=dims["eps"])
        elif arch == "mpnet":
            from .encoder_variants import MPNetEncoder
            module = MPNetEncoder(
                vocab_size=dims["vocab"], hidden=dims["hidden"],
                layers=dims["layers"], heads=dims["heads"],
                intermediate=dims["intermediate"], max_len=dims["max_len"],
                num_buckets=dims["num_buckets"], pad_idx=dims["pad_idx"],
                eps=dims["eps"])
        else:
            module = TransformerQuestionEncoder(
                vocab_size=dims["vocab"], hidden=dims["hidden"],
                layers=dims["layers"], heads=dims["heads"],
                intermediate=dims["intermediate"], max_len=dims["max_len"],
                position_style=arch, pad_idx=dims.get("pad_idx", 0))
        return cls(word_dim=dims["hidden"], params=params, module=module, **kw)

    def encode(self, tokens: np.ndarray, mask: Optional[np.ndarray] = None,
               pad_id: int = 0, batch: int = 256) -> np.ndarray:
        """tokens [N, L] -> hidden [N, L, D] (host numpy, chunked)."""
        tokens = np.asarray(tokens, dtype=np.int32)
        if mask is None:
            mask = (tokens != pad_id).astype(np.float32)
        outs = []
        for i in range(0, len(tokens), batch):
            outs.append(np.asarray(self._fwd(tokens[i:i + batch], mask[i:i + batch])))
        return np.concatenate(outs, axis=0) if outs else np.zeros(
            tokens.shape + (self.module.hidden,), np.float32)


def maybe_frozen_lm(lm: str, word_dim: int, seed: int = 0,
                    logger=None) -> FrozenLM:
    """HF weights when available, deterministic random encoder otherwise.

    The chosen source is logged LOUDLY and recorded on the returned object
    (``.weight_source``) so a typo'd --lm or a broken checkpoint path can
    never silently train a different model (the reference hard-fails
    instead, bert_encoder.py:30-59; we degrade for offline test
    environments, but visibly). Callers stamp ``weight_source`` into
    checkpoint metadata and the `.info` sidecar."""
    import logging
    logger = logger or logging.getLogger("gnn_rag_tpu")
    try:
        enc = FrozenLM.from_hf(lm)
        enc.weight_source = f"hf:{lm}"
        logger.info("frozen LM: loaded HF weights for %r", lm)
        return enc
    except Exception as e:
        enc = FrozenLM(word_dim=word_dim, seed=seed)
        enc.weight_source = f"random-init(seed={seed}; {type(e).__name__}: {e})"
        logger.warning(
            "frozen LM: RANDOM INIT fallback for %r (%s: %s) — question/"
            "relation features use a deterministic random encoder, NOT "
            "pretrained weights", lm, type(e).__name__, e)
        return enc
