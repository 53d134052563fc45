"""GraftNet — layer-wise GNN with question->fact attention and
personalized-pagerank distribution propagation.

Port of the reference GraftNet (gnn/models/GraftNet/graftnet.py:21-183 +
gnn/modules/kg_reasoning/graft_gnn.py:14-153) onto the padded GraphBatch: the
reference's batched 3-D sparse matrices (entity2fact/fact2entity,
base_gnn.py:56-75) are exactly gather-at-heads / scatter-at-tails over the
padded COO arrays, so no extra data structure is needed. Padded fact slots
are excluded from the attention softmax and all scatters via fact_mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.batch import GraphBatch
from ..ops.segment import gather_entities_to_facts, scatter_facts_to_entities
from ..ops.softmax import VERY_NEG_NUMBER, masked_softmax
from . import base
from .encoders import (AttnEncoder, LSTMQuestionEncoder,
                       TransformerQuestionEncoder, TypeLayer,
                       make_inmodel_lm)

VERY_SMALL_NUMBER = 1e-10


class GraftReasoning(nn.Module):
    """num_layer Graft layers (graft_gnn.py:27-153)."""

    entity_dim: int
    num_layer: int
    pagerank_lambda: float
    fact_scale: float
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch: GraphBatch, ent_emb, seed_dist, query_hidden,
                 query_node, query_mask, rel_features, candidate_mask,
                 fact_mask, *, deterministic: bool = True):
        D = self.entity_dim
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        score_func = nn.Dense(1, name="score_func")
        B, E = seed_dist.shape
        div = jnp.sqrt(jnp.asarray(D, jnp.float32))

        local_fact_emb = rel_features[batch.rels]                 # [B, F, D]

        # ---- question->fact attention, computed once (graft_gnn.py:64-87) ----
        sim = jnp.einsum("bld,bfd->blf", query_hidden, local_fact_emb) / div
        sim = jax.nn.softmax(
            sim + (1.0 - query_mask[:, :, None]) * VERY_NEG_NUMBER, axis=1)
        fact2query_att = jnp.einsum("blf,bld->bfd", sim, query_hidden)
        W = jnp.sum(fact2query_att * local_fact_emb, axis=2) / div  # [B, F]
        W = jnp.where(fact_mask > 0, W, -jnp.inf)
        W_max = jnp.max(W, axis=1, keepdims=True)
        W_tilde = jnp.where(fact_mask > 0, jnp.exp(W - W_max), 0.0)
        e2f_softmax = scatter_facts_to_entities(W_tilde[..., None],
                                                batch.heads, E)[..., 0]
        e2f_softmax = jnp.maximum(e2f_softmax, VERY_SMALL_NUMBER)

        curr_dist = seed_dist
        score_history = []
        last_score_tp = None
        for step in range(self.num_layer):
            kb_self = nn.Dense(D, name=f"kb_self_linear{step}")
            kb_head = nn.Dense(D, name=f"kb_head_linear{step}")
            kb_tail = nn.Dense(D, name=f"kb_tail_linear{step}")
            q2e = nn.Dense(D, name=f"q2e_linear{step}")
            e2q = nn.Dense(D, name=f"e2q_linear{step}")
            e2e = nn.Dense(D, name=f"e2e_linear{step}")

            # fact representations gated by attention-normalised distribution
            e2f_emb = jax.nn.relu(
                kb_self(local_fact_emb)
                + gather_entities_to_facts(kb_head(drop(ent_emb)), batch.heads))
            e2f_norm = W_tilde * gather_entities_to_facts(
                curr_dist / e2f_softmax, batch.heads)             # [B, F]
            e2f_emb = e2f_emb * e2f_norm[..., None]
            f2e_emb = jax.nn.relu(
                kb_self(ent_emb)
                + scatter_facts_to_entities(kb_tail(drop(e2f_emb)),
                                            batch.tails, E, fact_mask))
            next_dist = (self.pagerank_lambda
                         * scatter_facts_to_entities(
                             (e2f_norm * fact_mask)[..., None],
                             batch.tails, E)[..., 0]
                         + (1 - self.pagerank_lambda) * curr_dist)

            q2e_emb = jnp.broadcast_to(q2e(drop(query_node))[:, None, :],
                                       (B, E, D))
            next_emb = jnp.concatenate(
                [ent_emb, q2e_emb, self.fact_scale * f2e_emb], axis=2)
            query_node = jnp.einsum("be,bed->bd", next_dist,
                                    e2q(drop(next_emb)))
            ent_emb = jax.nn.relu(e2e(drop(next_emb)))

            score_tp = score_func(drop(ent_emb))[..., 0]
            score = masked_softmax(score_tp, candidate_mask, axis=1)
            score_history.append(score)
            last_score_tp = score_tp
            curr_dist = next_dist

        return last_score_tp, score_history


class GraftNet(nn.Module):
    cfg: ModelConfig
    num_entity: int
    num_relation: int
    num_word: int = 0

    @nn.compact
    def __call__(self, batch: GraphBatch,
                 rel_hidden: Optional[jnp.ndarray] = None,
                 rel_hidden_inv: Optional[jnp.ndarray] = None,
                 rel_text_mask: Optional[jnp.ndarray] = None,
                 entity_emb: Optional[jnp.ndarray] = None,
                 word_emb: Optional[jnp.ndarray] = None,
                 relation_emb: Optional[jnp.ndarray] = None,
                 *, training: bool = False, return_attn: bool = False):
        if return_attn:
            raise ValueError("GraftNet has no instruction attention to "
                             "export (the reference's GraftNet also returns "
                             "tp_list=None)")
        cfg = self.cfg
        D = cfg.entity_dim
        det = not training
        B, E = batch.seed_dist.shape

        fact_mask = batch.fact_mask
        drop_keep = None
        if training and cfg.fact_drop > 0.0:
            drop_keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - cfg.fact_drop,
                fact_mask.shape).astype(fact_mask.dtype)
            fact_mask = fact_mask * drop_keep  # layout path gated via perm

        if cfg.lm == "lstm":
            query_hidden, query_node = LSTMQuestionEncoder(
                D, self.num_word, cfg.word_dim, cfg.lm_dropout,
                name="instruction_encoder")(batch.q_tokens, deterministic=det,
                                            pretrained=word_emb)
            question_emb = nn.Dense(D, name="question_emb")
        else:
            raw_hidden = (batch.q_hidden if batch.q_hidden is not None else
                          make_inmodel_lm(cfg)(
                              batch.q_tokens, batch.q_mask))
            question_emb = nn.Dense(D, name="question_emb")
            query_hidden = question_emb(raw_hidden)
            query_node = question_emb(raw_hidden[:, 0, :])

        self_att_r = AttnEncoder(D, name="self_att_r")
        if rel_hidden is not None:
            rel_features = self_att_r(question_emb(rel_hidden), rel_text_mask)
        elif relation_emb is not None:
            # frozen pretrained relation table (base_model.py:122-134)
            rel_features = nn.Dense(D, name="relation_linear1")(relation_emb)
        else:
            rel_features = nn.Dense(D, name="relation_linear1")(
                nn.Embed(self.num_relation + 1, D, name="relation_embedding")(
                    jnp.arange(self.num_relation + 1)))

        if entity_emb is not None:
            gids = jnp.minimum(batch.entity_gids, entity_emb.shape[0] - 1)
            ent_emb = nn.Dense(D, name="entity_linear")(entity_emb[gids])
        else:
            ent_emb = TypeLayer(D, cfg.norm_rel, name="type_layer")(
                rel_features, batch.heads, batch.rels, batch.tails, fact_mask,
                E, batch.fact_rel_weight, layout=batch.layout,
                drop_keep=drop_keep)

        candidate_mask = batch.candidate_mask(self.num_entity)
        reasoning = GraftReasoning(D, cfg.num_layer, cfg.pagerank_lambda,
                                   cfg.fact_scale, cfg.linear_dropout,
                                   name="reasoning")
        score_tp, score_history = reasoning(
            batch, ent_emb, batch.seed_dist, query_hidden, query_node,
            batch.q_mask, rel_features, candidate_mask, fact_mask,
            deterministic=det)

        pred_dist = score_history[-1]
        # loss on the raw logits with BCE by default (graftnet.py:28, 170)
        loss = base.calc_loss_label(
            score_tp if cfg.loss_type == "bce" else pred_dist,
            batch.answer_dist, cfg.loss_type)
        pred = jnp.argmax(pred_dist, axis=1)
        return loss, pred, pred_dist
