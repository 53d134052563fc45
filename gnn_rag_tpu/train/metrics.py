"""Host-side retrieval metrics: eps-cumulative candidate extraction and
precision/recall/F1/Hit@1/EM.

Exact ports of the candidate semantics the LLM half depends on:
* candidate filtering (reference: gnn/evaluate.py:188-208): drop seed
  entities, padding slots, and probs below (1 - eps) / max_local_entity
  (dataset-global max, parsing.py:62 eps=0.95);
* cumulative-probability cutoff: candidates sorted by prob desc are taken
  until the running prob mass exceeds eps (evaluate.py:40-50,
  base_model.py:217-246).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def extract_candidates(probs: np.ndarray, entity_gids: np.ndarray,
                       query_entities: np.ndarray, pad_ent_id: int,
                       ignore_prob: float) -> List[Tuple[int, float]]:
    """Per-sample candidate list in local slot order (evaluate.py:195-208):
    seed entities, padding slots, and probs below the eps floor are dropped.
    Vectorised; slot order is preserved so downstream stable sorts match the
    reference's tie-breaking."""
    keep = ((query_entities != 1.0) & (entity_gids != pad_ent_id)
            & (probs >= ignore_prob))
    idx = np.nonzero(keep)[0]
    gids = entity_gids[idx].tolist()
    ps = probs[idx].tolist()
    return list(zip(gids, ps))


def f1_and_hits_eval(answers: Sequence[int],
                     candidate2prob: Sequence[Tuple[int, float]],
                     eps: float = 0.95):
    """Returns (precision, recall, f1, hit, em, case, retrieved) with the
    reference's exact edge-case conventions (evaluate.py:25-67). ``retrieved``
    keeps raw global ids; callers map to mids/names."""
    cand_list = sorted(candidate2prob, key=lambda x: x[1], reverse=True)
    best_ans = cand_list[0][0] if cand_list else -1
    answers_set = set(answers)
    retrieved: List[Tuple[int, float]] = []
    correct = 0
    tp_prob = 0.0
    for c, prob in cand_list:
        retrieved.append((c, prob))
        tp_prob += prob
        if c in answers_set:
            correct += 1
        if tp_prob > eps:
            break
    em = 1 if correct > 0 else 0
    if len(answers) == 0:
        if len(retrieved) == 0:
            return 1.0, 1.0, 1.0, 1.0, 1.0, 0, retrieved
        return 0.0, 1.0, 0.0, 1.0, 1.0, 1, retrieved
    hits = float(best_ans in answers_set)
    if len(retrieved) == 0:
        return 1.0, 0.0, 0.0, hits, hits, 2, retrieved
    p = correct / len(retrieved)
    r = correct / len(answers)
    f1 = 2.0 / (1.0 / p + 1.0 / r) if p != 0 and r != 0 else 0.0
    return p, r, f1, hits, em, 3, retrieved


def f1_and_hits_train(answers: Sequence[int],
                      candidate2prob: Sequence[Tuple[int, float]],
                      eps: float = 0.95):
    """Training-time variant (base_model.py:217-246): returns
    (precision, recall, f1, hits); em/case/retrieved not tracked."""
    p, r, f1, hits, _, _, _ = f1_and_hits_eval(answers, candidate2prob, eps)
    return p, r, f1, hits


def train_batch_f1(pred_dist: np.ndarray, answer_dist: np.ndarray,
                   h1_vec: np.ndarray, entity_gids: np.ndarray,
                   seed_dist: np.ndarray, pad_ent_id: int,
                   eps: float) -> List[float]:
    """Training F1 computed only for Hit@1-positive samples
    (base_model.py:249-285). ``seed_dist`` is the SEED DISTRIBUTION (s > 0
    skips), unlike eval which uses the binary query_entities (s == 1.0)."""
    B, E = pred_dist.shape
    ignore_prob = (1 - eps) / E
    f1s: List[float] = []
    for b in range(B):
        if h1_vec[b] == 0.0:
            f1s.append(0.0)
            continue
        answer_list = []
        cand2prob = []
        for c, p, pa, s in zip(entity_gids[b].tolist(), pred_dist[b].tolist(),
                               answer_dist[b].tolist(), seed_dist[b].tolist()):
            if s > 0:
                continue
            if c == pad_ent_id:
                continue
            if pa > 0:
                answer_list.append(c)
            if p < ignore_prob:
                continue
            cand2prob.append((c, p))
        _, _, f1, _ = f1_and_hits_train(answer_list, cand2prob, eps)
        f1s.append(f1)
    return f1s


def train_f1_device(pred_dist, answer_dist, h1_vec, entity_gids, seed_dist,
                    pad_ent_id: int, eps: float):
    """On-device vectorised twin of train_batch_f1 (base_model.py:249-285):
    returns a [B] jnp vector of per-sample training F1.

    Replicates the host semantics exactly — skip seed/pad slots, eps-floor
    candidates, stable prob-descending sort (ties keep slot order, like the
    reference's sorted() over the slot-ordered list), cumulative-prob cutoff
    that includes the first crossing, and the reference's zero/empty edge
    cases — so the training loop never has to fetch pred_dist to the host
    (each fetch is a full round trip through the TPU tunnel)."""
    import jax.numpy as jnp

    B, E = pred_dist.shape
    ignore_prob = (1.0 - eps) / E
    skip = (seed_dist > 0) | (entity_gids == pad_ent_id)
    is_ans = (~skip) & (answer_dist > 0)
    cand = (~skip) & (pred_dist >= ignore_prob)
    # non-candidates sort after every candidate (probs >= ignore_prob > -1)
    sort_key = jnp.where(cand, pred_dist, -1.0)
    order = jnp.argsort(-sort_key, axis=1, stable=True)
    sorted_p = jnp.take_along_axis(jnp.where(cand, pred_dist, 0.0), order, 1)
    sorted_cand = jnp.take_along_axis(cand, order, 1)
    sorted_ans = jnp.take_along_axis(is_ans, order, 1)
    cum = jnp.cumsum(sorted_p, axis=1)
    # retrieved iff the cumulative mass BEFORE this candidate is <= eps
    # (the reference appends, then breaks once tp_prob > eps)
    in_retr = sorted_cand & ((cum - sorted_p) <= eps)
    n_retr = in_retr.sum(axis=1)
    correct = (in_retr & sorted_ans).sum(axis=1)
    n_ans = is_ans.sum(axis=1)
    p = correct / jnp.maximum(n_retr, 1)
    r = correct / jnp.maximum(n_ans, 1)
    f1 = jnp.where((p > 0) & (r > 0), 2.0 * p * r / (p + r), 0.0)
    f1 = jnp.where(n_ans == 0, jnp.where(n_retr == 0, 1.0, 0.0), f1)
    return jnp.where(h1_vec > 0, f1, 0.0)


def cal_accuracy(pred: np.ndarray, answer_dist: np.ndarray) -> Tuple[float, float]:
    """(top-1 accuracy, answerable fraction) — evaluate.py:10-22."""
    num_correct = sum(float(answer_dist[i, l] != 0) for i, l in enumerate(pred))
    num_answerable = sum(1.0 for dist in answer_dist if np.sum(dist) != 0)
    return num_correct / len(pred), num_answerable / len(pred)
