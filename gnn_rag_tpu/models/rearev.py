"""ReaRev — instruction-conditioned iterative GNN reasoner (flagship model).

TPU-first re-design of the reference ReaRev
(gnn/models/ReaRev/rearev.py:19-243 + gnn/modules/kg_reasoning/reasongnn.py):

* message passing is batched gather-gate-scatter over the padded COO arrays
  of a GraphBatch instead of per-batch torch.sparse matmuls;
* all num_ins instruction branches of a GNN step are fused into ONE gather and
  ONE scatter of width num_ins*D (the reference issues 2*num_ins sparse
  matmuls per step, reasongnn.py:150-156);
* the frozen question/relation LM runs outside the jitted step (precomputed
  hidden states), matching lm_frozen=1 semantics (bert_encoder.py:80-83)
  without re-running a frozen BERT every step like the reference does.

Forward contract (rearev.py:163-243): encode question -> num_ins instructions
-> num_iter outer iterations of (num_gnn GNN steps starting from the seed
distribution + instruction reformulation) -> masked softmax answer
distribution; KL loss against the answer distribution.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.batch import GraphBatch
from ..ops.degree import head_degree_weight
from ..ops.segment import gather_entities_to_facts, scatter_facts_to_entities
from ..ops.softmax import masked_softmax
from . import base
from .encoders import (AttnEncoder, InstructionDecoder, LSTMQuestionEncoder,
                       QueryReform, TransformerQuestionEncoder, TypeLayer,
                       make_inmodel_lm)


class ReasonGNN(nn.Module):
    """One stack of num_gnn reasoning steps (reasongnn.py:11-174)."""

    entity_dim: int
    num_ins: int
    num_gnn: int
    num_relation_rows: int          # num_kb_relation + 1 (for pos_emb tables)
    normalized_gnn: bool = False
    pos_emb: bool = False
    dropout: float = 0.0
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: GraphBatch, ent_emb: jnp.ndarray,
                 curr_dist: jnp.ndarray, instructions: jnp.ndarray,
                 rel_features: jnp.ndarray, rel_features_inv: jnp.ndarray,
                 candidate_mask: jnp.ndarray, fact_mask: jnp.ndarray,
                 *, deterministic: bool = True,
                 drop_keep: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, E = curr_dist.shape
        J, D = self.num_ins, self.entity_dim
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        score_func = nn.Dense(1, name="score_func")

        layout = batch.layout if not self.pos_emb else None  # pos_emb: XLA path

        if layout is not None:
            from ..ops.pallas_mp import (gate_scatter, gate_scatter_both,
                                         gate_scatter_projected)
            from ..ops.segment import (batched_segment_sum, layout_fact_keep,
                                       mxu_gather)
            # bf16 gate values run the MXU at full rate (f32 accumulate in
            # the kernel either way); f32 uses exact HIGHEST passes
            cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
            # v4 (default): both directions in ONE kernel launch with
            # whole-sample VMEM-resident outputs (halves grid iterations and
            # output writebacks vs v3). v3 keeps per-direction launches;
            # v2 keeps the rel projection in-kernel (GNN_RAG_GATE_SCATTER).
            variant = os.environ.get("GNN_RAG_GATE_SCATTER", "v4")
            use_v4 = variant == "v4"
            use_v3 = variant == "v3"
            fact_rel_f = rel_features[layout.fwd.rels].astype(cdt)  # [B, Fp, D]
            fact_rel_i = rel_features_inv[layout.inv.rels].astype(cdt)
            valid_f = (layout.fwd.scatter >= 0).astype(curr_dist.dtype)
            valid_i = (layout.inv.scatter >= 0).astype(curr_dist.dtype)
            if drop_keep is not None:
                # fact dropout stays on the fused path: dropped facts get a
                # zero prior/weight instead of a layout rebuild
                # (reference drops them at batch build, dataset_load.py:489-490)
                valid_f = valid_f * layout_fact_keep(layout.fwd, drop_keep)
                valid_i = valid_i * layout_fact_keep(layout.inv, drop_keep)
            if self.normalized_gnn:
                # 1/out-degree(gather entity), squared: the reference applies
                # the weight on both the prior and the scatter (base_gnn.py:38-48)
                def w2(direction, valid):
                    cnt = batched_segment_sum(valid, direction.gather, E)
                    per = jnp.take_along_axis(cnt, direction.gather, axis=1)
                    w = jnp.where(per > 0, 1.0 / jnp.maximum(per, 1.0), 0.0)
                    return w * w * valid
                norm_f = w2(layout.fwd, valid_f)
                norm_i = w2(layout.inv, valid_i)
            else:
                norm_f, norm_i = valid_f, valid_i
        else:
            fact_w = fact_mask
            if self.normalized_gnn:
                fact_w = head_degree_weight(batch.heads, fact_mask, E)
            # relation features per fact, both directions: [B, F, D]
            fact_rel = rel_features[batch.rels]
            fact_rel_inv = rel_features_inv[batch.rels]

        for step in range(self.num_gnn):
            w_step = self.param(f"rel_linear{step}",
                                nn.initializers.lecun_normal(), (D, D))
            b_step = self.param(f"rel_linear{step}_bias",
                                nn.initializers.zeros, (D,))

            if layout is not None:
                # fused Pallas path: gather+gate+prior+scatter in one kernel.
                # The prior gather rides the MXU (ops/segment.mxu_gather):
                # XLA's native [B,F]-from-[B,E] gather is a ~10ns/element
                # serial loop that was 26% of the train step, and its
                # scatter-add transpose another 17% (kernel_floor_r05).
                prior_f = mxu_gather(curr_dist, layout.fwd.gather) * norm_f
                prior_i = mxu_gather(curr_dist, layout.inv.gather) * norm_i
                if use_v4:
                    # projection as one big XLA matmul per step-direction;
                    # both direction scatters fused into ONE kernel launch
                    # with j-major [B, E, J*D] outputs
                    w_c, b_c = w_step.astype(cdt), b_step.astype(cdt)
                    out_f, out_i = gate_scatter_both(
                        fact_rel_f @ w_c + b_c, fact_rel_i @ w_c + b_c,
                        instructions.astype(cdt), prior_f, prior_i,
                        layout, E)
                    # reference order fwd_0, inv_0, fwd_1, inv_1
                    # (reasongnn.py:150-156): interleave directions per j
                    neighbors = jnp.concatenate(
                        [out_f.reshape(B, E, J, 1, D),
                         out_i.reshape(B, E, J, 1, D)],
                        axis=3).reshape(B, E, 2 * J * D)
                elif use_v3:
                    # projection as one big XLA matmul per step-direction
                    # (MXU-efficient, dense backward), kernel gates+scatters
                    w_c, b_c = w_step.astype(cdt), b_step.astype(cdt)
                    nb_fwd = gate_scatter_projected(
                        fact_rel_f @ w_c + b_c, instructions.astype(cdt),
                        prior_f, layout.fwd, E)                # [B, J, E, D]
                    nb_inv = gate_scatter_projected(
                        fact_rel_i @ w_c + b_c, instructions.astype(cdt),
                        prior_i, layout.inv, E)
                else:
                    nb_fwd = gate_scatter(fact_rel_f, w_step.astype(cdt),
                                          b_step.astype(cdt),
                                          instructions.astype(cdt),
                                          prior_f, layout.fwd, E)
                    nb_inv = gate_scatter(fact_rel_i, w_step.astype(cdt),
                                          b_step.astype(cdt),
                                          instructions.astype(cdt),
                                          prior_i, layout.inv, E)
                if not use_v4:
                    # reference order fwd_0, inv_0, ... (reasongnn.py:150-156)
                    neighbors = jnp.stack([nb_fwd, nb_inv], axis=2)
                    neighbors = jnp.moveaxis(neighbors, (1, 2), (2, 3)
                                             ).reshape(B, E, 2 * J * D)
            else:
                rl_fwd = fact_rel @ w_step + b_step
                rl_inv = fact_rel_inv @ w_step + b_step
                if self.pos_emb:  # reasongnn.py:41-43, 74-77
                    rl_fwd = rl_fwd + nn.Embed(self.num_relation_rows, D,
                                               name=f"pos_emb{step}")(batch.rels)
                    rl_inv = rl_inv + nn.Embed(self.num_relation_rows, D,
                                               name=f"pos_emb_inv{step}")(batch.rels)
                # gates: relu(rel_linear(rel) * instruction_j) for every j
                gate_fwd = jax.nn.relu(rl_fwd[:, :, None, :] * instructions[:, None, :, :])
                gate_inv = jax.nn.relu(rl_inv[:, :, None, :] * instructions[:, None, :, :])
                # fact priors from the current distribution (reasongnn.py:80, 106)
                prior_fwd = gather_entities_to_facts(curr_dist, batch.heads) * fact_w
                prior_inv = gather_entities_to_facts(curr_dist, batch.tails) * fact_w
                val_fwd = (gate_fwd * prior_fwd[:, :, None, None]).reshape(B, -1, J * D)
                val_inv = (gate_inv * prior_inv[:, :, None, None]).reshape(B, -1, J * D)
                # one scatter per direction (scatter weight = fact_w again,
                # matching the reference's use of the same vals in fact2tail_mat)
                nb_fwd = scatter_facts_to_entities(val_fwd, batch.tails, E, fact_w)
                nb_inv = scatter_facts_to_entities(val_inv, batch.heads, E, fact_w)
                nb_fwd = nb_fwd.reshape(B, E, J, D)
                nb_inv = nb_inv.reshape(B, E, J, D)
                # reference order: fwd_0, inv_0, ... (reasongnn.py:150-156)
                neighbors = jnp.stack([nb_fwd, nb_inv], axis=3).reshape(B, E, 2 * J * D)

            nxt = jnp.concatenate([ent_emb, neighbors], axis=2)
            ent_emb = jax.nn.relu(
                nn.Dense(D, name=f"e2e_linear{step}")(drop(nxt)))
            score = score_func(drop(ent_emb))[..., 0]
            curr_dist = masked_softmax(score, candidate_mask, axis=1)

        return curr_dist, ent_emb


class ReaRev(nn.Module):
    """Full ReaRev model over a GraphBatch."""

    cfg: ModelConfig
    num_entity: int
    num_relation: int               # num_kb_relation
    num_word: int = 0

    @nn.compact
    def __call__(self, batch: GraphBatch,
                 rel_hidden: Optional[jnp.ndarray] = None,
                 rel_hidden_inv: Optional[jnp.ndarray] = None,
                 rel_text_mask: Optional[jnp.ndarray] = None,
                 entity_emb: Optional[jnp.ndarray] = None,
                 word_emb: Optional[jnp.ndarray] = None,
                 relation_emb: Optional[jnp.ndarray] = None,
                 *, training: bool = False, return_attn: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        """Returns (loss, pred_top1, pred_dist)[, instruction_attn].

        return_attn additionally returns the instruction attention over
        question tokens [B, num_ins, L] — the interpretable artifact the
        reference's write_info slots ("0".."num_iter-1") were designed for
        (evaluate.py:106-137; at eval the reference models return
        tp_list=None so the shipped slots are empty — attention export here
        is an opt-in extension).

        rel_hidden[_inv]: [R+1, Lr, word_dim] frozen-LM token states over
        relation surface forms (equivalent of base_model.encode_rel_texts,
        base_model.py:168-176); rel_text_mask: [R+1, Lr]. When None, a
        trainable relation embedding table is used instead (rearev.py:95-99).
        entity_emb: optional frozen pretrained KG entity table
        [num_entity+1, ent_dim] — switches entity init from TypeLayer to
        embedding lookup + projection (encode_type=False,
        base_model.py:96-114, rearev.py:79-88).
        word_emb: optional frozen word table for the LSTM encoder
        (base_model.py:79-89).
        relation_emb: optional frozen pretrained KG relation table
        [num_kb_relation+1, rel_dim] (relation_emb_file,
        base_model.py:122-134): used instead of the trainable tables when
        relation texts are off; kept frozen by being passed as data."""
        cfg = self.cfg
        D = cfg.entity_dim
        det = not training
        B, E = batch.seed_dist.shape

        # ---- fact dropout as an on-device mask (dataset_load.py:489-490);
        # self loops are appended after dropout in the reference
        # (dataset_load.py:499-506) and so are never dropped here either ----
        fact_mask = batch.fact_mask
        drop_keep = None
        if training and cfg.fact_drop > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - cfg.fact_drop, fact_mask.shape)
            is_self_loop = (batch.rels == self.num_relation - 1)
            drop_keep = jnp.where(is_self_loop, 1.0,
                                  keep.astype(fact_mask.dtype))
            fact_mask = fact_mask * drop_keep
            # drop_keep (canonical COO order) also gates the kernel-layout
            # paths below via each direction's perm map, so training with
            # fact_drop > 0 stays on the fused Pallas kernels

        # ---- question encoding ----
        if cfg.lm == "lstm":
            query_hidden, query_node = LSTMQuestionEncoder(
                D, self.num_word, cfg.word_dim, cfg.lm_dropout,
                name="instruction_encoder")(batch.q_tokens, deterministic=det,
                                            pretrained=word_emb)
            question_emb = nn.Dense(D, name="question_emb")  # rel-feature proj
        else:
            if batch.q_hidden is not None:
                raw_hidden = batch.q_hidden          # frozen LM, precomputed
            else:
                raw_hidden = make_inmodel_lm(cfg)(
                        batch.q_tokens, batch.q_mask)
            question_emb = nn.Dense(D, name="question_emb")  # bert_encoder.py:69
            query_hidden = question_emb(raw_hidden)
            query_node = question_emb(raw_hidden[:, 0, :])   # CLS (bert_encoder.py:102-104)

        # ---- relation features (rearev.py:91-111) ----
        self_att_r = AttnEncoder(D, name="self_att_r")
        if rel_hidden is not None:
            proj = question_emb(rel_hidden)                  # [R+1, Lr, D]
            proj_inv = question_emb(rel_hidden_inv)
            rel_features = self_att_r(proj, rel_text_mask)
            rel_features_inv = self_att_r(proj_inv, rel_text_mask)
        elif relation_emb is not None:
            # frozen pretrained relation table, shared projection
            # (base_model.py:122-134 + rearev.py:95-99; the reference's
            # relation_emb_file+ReaRev combination dereferences a
            # relation_embedding_inv that is never created in that branch —
            # here both directions project the same frozen table)
            rel_features = nn.Dense(D, name="relation_linear")(relation_emb)
            rel_features_inv = nn.Dense(D, name="relation_linear_inv_proj")(
                relation_emb)
        else:
            rel_features = nn.Dense(D, name="relation_linear")(
                nn.Embed(self.num_relation + 1, D, name="relation_embedding")(
                    jnp.arange(self.num_relation + 1)))
            rel_features_inv = nn.Dense(D, name="relation_linear_inv_proj")(
                nn.Embed(self.num_relation + 1, D, name="relation_embedding_inv")(
                    jnp.arange(self.num_relation + 1)))

        # ---- instructions ----
        instructions, ins_attn = InstructionDecoder(
            D, cfg.num_ins, cfg.linear_dropout, name="instruction_decoder")(
            query_hidden, query_node, batch.q_mask, deterministic=det)

        # ---- entity init (rearev.py:79-88) ----
        if entity_emb is not None:
            # encode_type=False: pretrained KG embeddings, pad row = last
            gids = jnp.minimum(batch.entity_gids, entity_emb.shape[0] - 1)
            ent_emb = nn.Dense(D, name="entity_linear")(entity_emb[gids])
        else:
            ent_emb = TypeLayer(D, cfg.norm_rel, name="type_layer")(
                rel_features, batch.heads, batch.rels, batch.tails, fact_mask,
                E, batch.fact_rel_weight, layout=batch.layout,
                drop_keep=drop_keep)

        candidate_mask = batch.candidate_mask(self.num_entity)
        reasoning = ReasonGNN(D, cfg.num_ins, cfg.num_gnn,
                              self.num_relation + 1,
                              normalized_gnn=cfg.normalized_gnn,
                              pos_emb=cfg.pos_emb,
                              dropout=cfg.linear_dropout,
                              compute_dtype=cfg.compute_dtype,
                              name="reasoning")
        reforms = [QueryReform(D, name=f"reform{j}") for j in range(cfg.num_ins)]

        # ---- iterative reasoning (rearev.py:206-221) ----
        curr_dist = batch.seed_dist
        pred_dist = curr_dist
        for t in range(cfg.num_iter):
            curr_dist = batch.seed_dist                      # reset (rearev.py:208)
            curr_dist, ent_emb = reasoning(
                batch, ent_emb, curr_dist, instructions, rel_features,
                rel_features_inv, candidate_mask, fact_mask, deterministic=det,
                drop_keep=drop_keep)
            pred_dist = curr_dist
            if t < cfg.num_iter - 1:
                new_ins = [reforms[j](instructions[:, j, :], ent_emb,
                                      batch.query_entities)
                           for j in range(cfg.num_ins)]
                instructions = jnp.stack(new_ins, axis=1)

        loss = base.calc_loss_label(pred_dist, batch.answer_dist, cfg.loss_type)
        pred = jnp.argmax(pred_dist, axis=1)
        if return_attn:
            return loss, pred, pred_dist, ins_attn[..., 0]   # [B, J, L]
        return loss, pred, pred_dist
