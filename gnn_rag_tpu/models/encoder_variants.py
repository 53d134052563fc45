"""Question-encoder architecture variants beyond the BERT family.

The reference selects among seven HF encoders by name
(bert_encoder.py:29-59): bert / roberta / simcse / relbert share the BERT
architecture (TransformerQuestionEncoder + utils.hf_import covers them),
while t5 (T5EncoderModel semantics, encode_question uses ``.encoder``,
bert_encoder.py:95-98) and sbert2 (MPNet) need their own blocks. These flax
modules mirror the HF forward exactly (parity-tested against torch in
tests/test_encoder_variants.py) and run once outside the train step like
every frozen encoder here.

RoBERTa reuses the BERT module with pad-aware position ids
(position_style="roberta"): positions = cumulative-non-pad + pad_idx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.softmax import VERY_NEG_NUMBER


def relative_position_bucket(rel_pos: jnp.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """T5/MPNet bidirectional relative-position bucketing
    (hf t5 _relative_position_bucket with bidirectional=True)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class T5Encoder(nn.Module):
    """T5 encoder stack (pre-RMSNorm, unscaled attention, shared relative
    position bias on every layer, ReLU feed-forward, no biases anywhere)."""

    vocab_size: int = 32128
    hidden: int = 512
    layers: int = 6
    heads: int = 8
    head_dim: int = 64
    intermediate: int = 2048
    num_buckets: int = 32
    max_distance: int = 128
    eps: float = 1e-6

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L = tokens.shape
        x = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")(tokens)
        # shared relative attention bias (HF: layer 0 owns the table)
        pos = jnp.arange(L)
        rel = pos[None, :] - pos[:, None]                     # k - q
        bucket = relative_position_bucket(rel, self.num_buckets,
                                          self.max_distance)
        bias_tbl = nn.Embed(self.num_buckets, self.heads,
                            name="rel_bias")(bucket)          # [L, L, H]
        pos_bias = jnp.transpose(bias_tbl, (2, 0, 1))[None]   # [1, H, L, L]
        attn_mask = (1.0 - mask[:, None, None, :]) * VERY_NEG_NUMBER

        for i in range(self.layers):
            h = T5RMSNorm(self.eps, name=f"ln_attn_{i}")(x)
            q = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                name=f"q_{i}")(h)
            k = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                name=f"k_{i}")(h)
            v = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                name=f"v_{i}")(h)
            # NOTE: T5 attention is NOT scaled by sqrt(d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + pos_bias + attn_mask
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            ctx = nn.DenseGeneral(self.hidden, axis=(-2, -1), use_bias=False,
                                  name=f"o_{i}")(ctx)
            x = x + ctx
            h = T5RMSNorm(self.eps, name=f"ln_ffn_{i}")(x)
            h = nn.Dense(self.intermediate, use_bias=False, name=f"wi_{i}")(h)
            h = jax.nn.relu(h)
            x = x + nn.Dense(self.hidden, use_bias=False, name=f"wo_{i}")(h)

        return T5RMSNorm(self.eps, name="final_ln")(x)


class MPNetEncoder(nn.Module):
    """MPNet encoder (sbert2 / all-mpnet-base-v2): BERT-style post-LN blocks
    with a T5-style shared relative position bias added to the scaled
    attention scores, and RoBERTa-style pad-aware absolute positions."""

    vocab_size: int = 30527
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_len: int = 512
    num_buckets: int = 32
    max_distance: int = 128
    pad_idx: int = 1
    eps: float = 1e-12

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L = tokens.shape
        hd = self.hidden // self.heads
        x = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")(tokens)
        # pad-aware positions: cumsum over non-pad + pad_idx (hf mpnet/roberta)
        m = mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(m, axis=1) * m + self.pad_idx
        pos_ids = jnp.minimum(pos_ids, self.max_len - 1)
        x = x + nn.Embed(self.max_len, self.hidden, name="pos_emb")(pos_ids)
        x = nn.LayerNorm(epsilon=self.eps, name="emb_ln")(x)

        rel = (pos_ids[:, None, :] - pos_ids[:, :, None])      # [B, L, L]
        bucket = relative_position_bucket(rel, self.num_buckets,
                                          self.max_distance)
        bias_tbl = nn.Embed(self.num_buckets, self.heads,
                            name="rel_bias")(bucket)           # [B, L, L, H]
        pos_bias = jnp.moveaxis(bias_tbl, 3, 1)                # [B, H, L, L]
        attn_mask = (1.0 - mask[:, None, None, :]) * VERY_NEG_NUMBER

        for i in range(self.layers):
            q = nn.DenseGeneral((self.heads, hd), name=f"q_{i}")(x)
            k = nn.DenseGeneral((self.heads, hd), name=f"k_{i}")(x)
            v = nn.DenseGeneral((self.heads, hd), name=f"v_{i}")(x)
            scores = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
                      + pos_bias + attn_mask)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
            ctx = nn.Dense(self.hidden, name=f"attn_out_{i}")(ctx)
            x = nn.LayerNorm(epsilon=self.eps, name=f"ln1_{i}")(x + ctx)
            h = nn.Dense(self.intermediate, name=f"ffn1_{i}")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(self.hidden, name=f"ffn2_{i}")(h)
            x = nn.LayerNorm(epsilon=self.eps, name=f"ln2_{i}")(x + h)
        return x
