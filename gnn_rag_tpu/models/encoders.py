"""Reusable NN modules: attention pooling, gated fusion, query reformulation,
relation-typed entity init, instruction generation, and question encoders.

Ports the semantics of the reference modules
(gnn/modules/query_update.py:6-61, gnn/modules/layer_init.py:9-62,
gnn/modules/question_encoding/*) onto flax.linen + the padded GraphBatch ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import scatter_facts_to_entities
from ..ops.softmax import VERY_NEG_NUMBER


class AttnEncoder(nn.Module):
    """Masked attention pooling over a token axis (query_update.py:46-61)."""

    d_hid: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: [..., L, D]; mask: [..., L]
        attn = nn.Dense(1, use_bias=False, name="attn_linear")(x)       # [..., L, 1]
        attn = attn - (1.0 - mask[..., None]) * 1e8                     # ref uses 1e8 here
        attn = jax.nn.softmax(attn, axis=-2)
        return jnp.sum(x * attn, axis=-2)


class Fusion(nn.Module):
    """Gated residual fusion (query_update.py:6-16)."""

    d_hid: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        cat = jnp.concatenate([x, y, x - y], axis=-1)
        r = nn.Dense(self.d_hid, use_bias=False, name="r")(cat)
        g = jax.nn.sigmoid(nn.Dense(self.d_hid, use_bias=False, name="g")(cat))
        return g * r + (1.0 - g) * x


class QueryReform(nn.Module):
    """Instruction reformulation from seed-entity GNN state
    (query_update.py:18-44). Only the seed-retrieve branch feeds the output in
    the reference (line 44); the entity-attention branch is computed there but
    unused, so it is omitted here.
    """

    h_dim: int

    @nn.compact
    def __call__(self, q_node: jnp.ndarray, ent_emb: jnp.ndarray,
                 seed_info: jnp.ndarray) -> jnp.ndarray:
        # q_node: [B, D]; ent_emb: [B, E, D]; seed_info: [B, E]
        seed_retrieve = jnp.einsum("be,bed->bd", seed_info, ent_emb)
        return Fusion(self.h_dim, name="fusion")(q_node, seed_retrieve)


class TypeLayer(nn.Module):
    """Entity init from incident relation types (layer_init.py:25-62):
    node features = relu(scatter_tails(W r) + scatter_heads(W r)).

    With a kernel layout present, both scatters run as fused Pallas
    one-hot matmuls (ops.pallas_mp)."""

    entity_dim: int
    norm_rel: bool = False

    @nn.compact
    def __call__(self, rel_features: jnp.ndarray, heads: jnp.ndarray,
                 rels: jnp.ndarray, tails: jnp.ndarray, fact_mask: jnp.ndarray,
                 num_entities: int,
                 rel_pair_weight: Optional[jnp.ndarray] = None,
                 layout=None,
                 drop_keep: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        D = self.entity_dim
        din = rel_features.shape[-1]
        w = self.param("kb_self_linear", nn.initializers.lecun_normal(),
                       (din, D))
        b = self.param("kb_self_linear_bias", nn.initializers.zeros, (D,))
        if layout is not None:
            from ..ops.pallas_mp import gate_scatter_projected
            from ..ops.segment import layout_fact_keep
            B = heads.shape[0]
            ones_ins = jnp.ones((B, 1, D), rel_features.dtype)

            def prior(direction):
                if self.norm_rel:
                    p = direction.weight
                else:
                    p = (direction.scatter >= 0).astype(rel_features.dtype)
                if drop_keep is not None:  # fact dropout on the fused path
                    p = p * layout_fact_keep(direction, drop_keep)
                return p

            # v3: project the [R, din] table once in XLA, gather projected
            # rows — the kernel only gates+scatters
            rl_tab = rel_features @ w + b                       # [R, D]
            out = (gate_scatter_projected(rl_tab[layout.fwd.rels], ones_ins,
                                          prior(layout.fwd), layout.fwd,
                                          num_entities, apply_relu=False)[:, 0]
                   + gate_scatter_projected(rl_tab[layout.inv.rels], ones_ins,
                                            prior(layout.inv), layout.inv,
                                            num_entities,
                                            apply_relu=False)[:, 0])
            return jax.nn.relu(out)

        fact_rel = rel_features[rels]                                   # [B, F, D]
        fact_val = fact_rel @ w + b
        wgt = fact_mask
        if self.norm_rel and rel_pair_weight is not None:
            wgt = wgt * rel_pair_weight
        f2t = scatter_facts_to_entities(fact_val, tails, num_entities, wgt)
        f2h = scatter_facts_to_entities(fact_val, heads, num_entities, wgt)
        return jax.nn.relu(f2t + f2h)


class InstructionDecoder(nn.Module):
    """Shared instruction-attention decoder (base_encoder.py:82-101).

    Produces num_ins instruction vectors by iterated attention over the
    question tokens, each step conditioned on the previous instruction.
    """

    entity_dim: int
    num_ins: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query_hidden: jnp.ndarray, query_node: jnp.ndarray,
                 query_mask: jnp.ndarray, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # query_hidden: [B, L, D] (projected); query_node: [B, D]; mask [B, L]
        B = query_hidden.shape[0]
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        cq_linear = nn.Dense(self.entity_dim, name="cq_linear")
        ca_linear = nn.Dense(1, name="ca_linear")
        ins = jnp.zeros((B, self.entity_dim), query_hidden.dtype)
        instructions = []
        attns = []
        for i in range(self.num_ins):
            q_i = nn.Dense(self.entity_dim, name=f"question_linear{i}")(
                drop(query_node))                                        # [B, D]
            cat = jnp.concatenate([ins, q_i, q_i - ins, q_i * ins], axis=-1)
            cq = cq_linear(drop(cat))                                    # [B, D]
            ca = ca_linear(drop(cq[:, None, :] * query_hidden))          # [B, L, 1]
            attn = jax.nn.softmax(
                ca + (1.0 - query_mask[..., None]) * VERY_NEG_NUMBER, axis=1)
            ins = jnp.sum(attn * query_hidden, axis=1)                   # [B, D]
            instructions.append(ins)
            attns.append(attn)
        return jnp.stack(instructions, axis=1), jnp.stack(attns, axis=1)


class LSTMQuestionEncoder(nn.Module):
    """Single-layer unidirectional LSTM over word embeddings
    (lstm_encoder.py:25-46). Returns per-token hidden states and the final
    hidden state as the query node embedding."""

    entity_dim: int
    num_word: int
    word_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, deterministic: bool = True,
                 pretrained: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if pretrained is not None:
            # frozen word embeddings, e.g. GloVe (base_model.py:79-89)
            emb = pretrained[jnp.minimum(tokens, pretrained.shape[0] - 1)]
        else:
            emb = nn.Embed(self.num_word + 1, self.word_dim,
                           name="word_embedding")(tokens)
        emb = nn.Dropout(self.dropout, deterministic=deterministic)(emb)
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.entity_dim), name="lstm")
        hidden = lstm(emb)                                              # [B, L, D]
        node = hidden[:, -1, :]                                         # h_n
        return hidden, node


class TransformerQuestionEncoder(nn.Module):
    """Minimal BERT-style encoder standing in for the reference's HF
    AutoModel (bert_encoder.py:74-109): embeddings + post-LN transformer
    blocks. Weight layout is compatible with loading converted MiniLM/BERT
    checkpoints (utils.hf_import)."""

    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_len: int = 512
    position_style: str = "bert"   # "roberta": pad-aware offset positions
    pad_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L = tokens.shape
        x = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")(tokens)
        if self.position_style == "roberta":
            # positions = cumulative non-pad count + pad_idx (hf roberta
            # create_position_ids_from_input_ids)
            m = mask.astype(jnp.int32)
            pos = jnp.cumsum(m, axis=1) * m + self.pad_idx
        else:
            pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        # clamp positions: an out-of-range gather past max_len is undefined
        # on the accelerator (observed as non-finite activations)
        pos = jnp.minimum(pos, self.max_len - 1)
        x = x + nn.Embed(self.max_len, self.hidden, name="pos_emb")(pos)
        x = x + self.param("type_emb", nn.initializers.zeros, (self.hidden,))
        x = nn.LayerNorm(name="emb_ln")(x)
        bias = (1.0 - mask[:, None, None, :]) * VERY_NEG_NUMBER
        for i in range(self.layers):
            # explicit attention so the mask additive-bias matches BERT
            q = nn.DenseGeneral((self.heads, self.hidden // self.heads), name=f"q_{i}")(x)
            k = nn.DenseGeneral((self.heads, self.hidden // self.heads), name=f"k_{i}")(x)
            v = nn.DenseGeneral((self.heads, self.hidden // self.heads), name=f"v_{i}")(x)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(q.shape[-1])
            probs = jax.nn.softmax(scores + bias, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, self.hidden)
            ctx = nn.Dense(self.hidden, name=f"attn_out_{i}")(ctx)
            x = nn.LayerNorm(name=f"ln1_{i}")(x + ctx)
            h = nn.Dense(self.intermediate, name=f"ffn1_{i}")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(self.hidden, name=f"ffn2_{i}")(h)
            x = nn.LayerNorm(name=f"ln2_{i}")(x + h)
        return x


def make_inmodel_lm(cfg, name: str = "lm") -> "TransformerQuestionEncoder":
    """In-model trainable question encoder for lm_frozen=0
    (bert_encoder.py:80-83). cfg.lm_spec (filled by the CLI from the loaded
    HF encoder) pins vocab/layers/heads/intermediate/positions so
    Trainer.seed_submodule always matches; None keeps MiniLM-class
    defaults."""
    if cfg.lm_spec is None:
        return TransformerQuestionEncoder(hidden=cfg.word_dim_effective,
                                          name=name)
    (vocab, hidden, layers, heads, intermediate, max_len,
     position_style, pad_idx) = cfg.lm_spec
    return TransformerQuestionEncoder(
        vocab_size=vocab, hidden=hidden, layers=layers, heads=heads,
        intermediate=intermediate, max_len=max_len,
        position_style=position_style, pad_idx=pad_idx, name=name)
