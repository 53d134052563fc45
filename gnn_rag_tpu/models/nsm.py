"""NSM — sequential instruction-per-step GNN reasoner.

Port of the reference NSM (gnn/models/NSM/nsm.py:19-254 +
gnn/modules/kg_reasoning/nsm_gnn.py) onto the padded GraphBatch substrate:

* num_step reasoning steps, ONE instruction each (vs ReaRev's all-instruction
  fused steps); forward message direction only (nsm_gnn.py:87-112);
* optional ``reason_kb`` candidate restriction: the softmax support shrinks to
  entities reachable from the current distribution (possible_tail,
  nsm_gnn.py:101-103);
* optional backward teacher (lambda_back / lambda_constrain): reasons from the
  normalized answer distribution with reversed instructions, adding a
  JS-divergence consistency loss (nsm.py:142-170, 227-246). The reference's
  backward layer reads ``rel_features_inv`` that is never initialised with
  default flags (latent bug); here backward uses the single relation feature
  table, documented deviation.

The per-step message op reuses the fused Pallas kernel with J=1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.batch import GraphBatch
from ..ops.segment import (batched_segment_sum, gather_entities_to_facts,
                           scatter_facts_to_entities)
from ..ops.softmax import masked_softmax
from . import base
from .encoders import (AttnEncoder, InstructionDecoder, LSTMQuestionEncoder,
                       TransformerQuestionEncoder, TypeLayer,
                       make_inmodel_lm)

VERY_SMALL_NUMBER = 1e-10


class NSMReasoning(nn.Module):
    """num_step NSM layers (nsm_gnn.py:14-112); ``backward=True`` swaps the
    message direction (NSMLayer_back, nsm_gnn.py:114-142)."""

    entity_dim: int
    num_step: int
    reason_kb: bool = False
    dropout: float = 0.0
    backward: bool = False

    @nn.compact
    def __call__(self, batch, ent_emb, seed_dist, instructions, rel_features,
                 candidate_mask, fact_mask, *, deterministic: bool = True,
                 drop_keep: Optional[jnp.ndarray] = None):
        """Runs all steps; returns (dist_history, ent_emb)."""
        D = self.entity_dim
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        B, E = seed_dist.shape
        score_func = nn.Dense(1, name="score_func")
        src = batch.heads if not self.backward else batch.tails
        dst = batch.tails if not self.backward else batch.heads
        layout = batch.layout

        curr_dist = seed_dist
        history = [curr_dist]
        for step in range(self.num_step):
            instruction = instructions[:, step, :]
            w_step = self.param(f"rel_linear{step}",
                                nn.initializers.lecun_normal(), (D, D))
            b_step = self.param(f"rel_linear{step}_bias",
                                nn.initializers.zeros, (D,))
            if layout is not None:
                from ..ops.pallas_mp import gate_scatter_projected
                from ..ops.segment import layout_fact_keep
                direction = layout.fwd if not self.backward else layout.inv
                valid = (direction.scatter >= 0).astype(curr_dist.dtype)
                if drop_keep is not None:  # fact dropout on the fused path
                    valid = valid * layout_fact_keep(direction, drop_keep)
                prior = (jnp.take_along_axis(curr_dist, direction.gather,
                                             axis=1) * valid)
                # v3: projection as one large XLA matmul over the gathered
                # features (the gather itself is loop-invariant and CSE'd
                # across steps); the kernel only gates+scatters
                fact_rel = rel_features[direction.rels]
                neighbor = gate_scatter_projected(fact_rel @ w_step + b_step,
                                                  instruction[:, None, :],
                                                  prior, direction,
                                                  E)[:, 0]    # [B, E, D]
                possible = (batched_segment_sum(
                    prior, jnp.maximum(direction.scatter, 0), E)
                    if self.reason_kb else None)
            else:
                fact_rel = rel_features[batch.rels]
                rl = fact_rel @ w_step + b_step
                gate = jax.nn.relu(rl * instruction[:, None, :])
                prior = gather_entities_to_facts(curr_dist, src) * fact_mask
                neighbor = scatter_facts_to_entities(gate * prior[..., None],
                                                     dst, E, fact_mask)
                possible = (batched_segment_sum(prior * fact_mask, dst, E)
                            if self.reason_kb else None)

            nxt = jnp.concatenate([ent_emb, neighbor], axis=2)
            ent_emb = jax.nn.relu(
                nn.Dense(D, name=f"e2e_linear{step}")(drop(nxt)))
            score = score_func(drop(ent_emb))[..., 0]
            mask = candidate_mask
            if self.reason_kb:
                mask = mask * (possible > VERY_SMALL_NUMBER).astype(mask.dtype)
            curr_dist = masked_softmax(score, mask, axis=1)
            history.append(curr_dist)
        return history, ent_emb


class NSM(nn.Module):
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
        cfg = self.cfg
        D = cfg.entity_dim
        det = not training
        B, E = batch.seed_dist.shape

        fact_mask = batch.fact_mask
        drop_keep = None
        if training and cfg.fact_drop > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - cfg.fact_drop, fact_mask.shape)
            is_self_loop = (batch.rels == self.num_relation - 1)
            drop_keep = jnp.where(is_self_loop, 1.0,
                                  keep.astype(fact_mask.dtype))
            fact_mask = fact_mask * drop_keep  # layout paths gated via perm

        # ---- question encoding (nsm.py:78-83) ----
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

        # ---- single-direction relation features (nsm.py:97-111) ----
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

        instructions, ins_attn = InstructionDecoder(
            D, cfg.num_step, cfg.linear_dropout, name="instruction_decoder")(
            query_hidden, query_node, batch.q_mask, deterministic=det)

        if entity_emb is not None:
            gids = jnp.minimum(batch.entity_gids, entity_emb.shape[0] - 1)
            ent_emb = nn.Dense(D, name="entity_linear")(entity_emb[gids])
        else:
            ent_emb = TypeLayer(D, cfg.norm_rel, name="type_layer")(
                rel_features, batch.heads, batch.rels, batch.tails, fact_mask,
                E, batch.fact_rel_weight, layout=batch.layout,
                drop_keep=drop_keep)

        candidate_mask = batch.candidate_mask(self.num_entity)
        reasoning = NSMReasoning(D, cfg.num_step, cfg.reason_kb,
                                 cfg.linear_dropout, name="reasoning")
        history, _ = reasoning(batch, ent_emb, batch.seed_dist, instructions,
                               rel_features, candidate_mask, fact_mask,
                               deterministic=det, drop_keep=drop_keep)
        pred_dist = history[-1]

        loss = base.calc_loss_label(pred_dist, batch.answer_dist, cfg.loss_type)

        # ---- backward teacher (nsm.py:219-246) ----
        if cfg.lambda_back != 0.0 or cfg.lambda_constrain != 0.0:
            answer_len = jnp.sum(batch.answer_dist, axis=1, keepdims=True)
            answer_len = jnp.where(answer_len == 0, 1.0, answer_len)
            answer_prob = batch.answer_dist / answer_len
            back_reasoning = NSMReasoning(
                D, cfg.num_step, cfg.reason_kb, cfg.linear_dropout,
                backward=True, name="reasoning_back")
            rev_ins = instructions[:, ::-1, :]
            back_history, _ = back_reasoning(
                batch, ent_emb, answer_prob, rev_ins, rel_features,
                candidate_mask, fact_mask, deterministic=det,
                drop_keep=drop_keep)
            case_valid = (jnp.sum(batch.answer_dist, axis=1, keepdims=True)
                          > 0).astype(pred_dist.dtype)
            # reference pairing (nsm.py:151-170): i=0 compares the backward
            # CHAIN START (the answer distribution itself) against the seed
            back_loss = base.masked_mean_loss(
                base.kl_loss_vec(back_history[0], history[0]), case_valid)
            constrain_loss = 0.0
            for i in range(1, cfg.num_step):
                js = base.js_div_vec(history[i], back_history[i])
                constrain_loss = constrain_loss + base.masked_mean_loss(
                    js, case_valid)
            loss = (loss + cfg.lambda_back * back_loss
                    + cfg.lambda_constrain * constrain_loss)

        pred = jnp.argmax(pred_dist, axis=1)
        if return_attn:
            # one instruction per reasoning step: attention rows align with
            # the "0".."num_step-1" info slots exactly
            return loss, pred, pred_dist, ins_attn[..., 0]
        return loss, pred, pred_dist
