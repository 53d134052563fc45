"""Loss and on-device metric functions shared by all GNN models.

Pure-function ports of BaseModel's losses/metrics
(reference: gnn/models/base_model.py:187-298).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VERY_SMALL_NUMBER = 1e-10


def kl_loss_vec(pred_dist: jnp.ndarray, answer_dist: jnp.ndarray) -> jnp.ndarray:
    """Elementwise KL(answer_prob || pred) with answer-count normalisation
    (base_model.py:193-199). Returns [B, E]; 0*log0 := 0."""
    answer_len = jnp.sum(answer_dist, axis=1, keepdims=True)
    answer_len = jnp.where(answer_len == 0, 1.0, answer_len)
    answer_prob = answer_dist / answer_len
    log_pred = jnp.log(pred_dist + 1e-8)
    # log(where(p>0, p, 1)) keeps gradients NaN-free at p == 0
    safe_log_ans = jnp.log(jnp.where(answer_prob > 0, answer_prob, 1.0))
    return jnp.where(answer_prob > 0, answer_prob * (safe_log_ans - log_pred), 0.0)


def bce_loss_vec(pred_logits: jnp.ndarray, answer_dist: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits against 0.9-smoothed binary labels (base_model.py:187-191)."""
    labels = (answer_dist > 0).astype(pred_logits.dtype) * 0.9
    # log-sigmoid formulation for stability
    log_p = jax.nn.log_sigmoid(pred_logits)
    log_not_p = jax.nn.log_sigmoid(-pred_logits)
    return -(labels * log_p + (1.0 - labels) * log_not_p)


def masked_mean_loss(loss_vec: jnp.ndarray, case_valid: jnp.ndarray) -> jnp.ndarray:
    """sum(loss * valid) / B (rearev.py:156-160)."""
    return jnp.sum(loss_vec * case_valid) / loss_vec.shape[0]


def calc_loss_label(pred: jnp.ndarray, answer_dist: jnp.ndarray,
                    loss_type: str = "kl") -> jnp.ndarray:
    """Full loss with no-answer filtering (rearev.py:227-233)."""
    answer_number = jnp.sum(answer_dist, axis=1, keepdims=True)
    case_valid = (answer_number > 0).astype(pred.dtype)
    vec = kl_loss_vec(pred, answer_dist) if loss_type == "kl" else \
        bce_loss_vec(pred, answer_dist)
    return masked_mean_loss(vec, case_valid)


def js_div_vec(dist_1: jnp.ndarray, dist_2: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence terms (nsm.py:142-149), elementwise [B, E]."""
    mean = (dist_1 + dist_2) / 2
    log_mean = jnp.log(mean + 1e-8)

    def kld(target):
        safe_log_t = jnp.log(jnp.where(target > 0, target, 1.0))
        return jnp.where(target > 0, target * (safe_log_t - log_mean), 0.0)

    return 0.5 * (kld(dist_1) + kld(dist_2))


def calc_h1(pred_dist: jnp.ndarray, answer_dist: jnp.ndarray,
            eps: float = VERY_SMALL_NUMBER) -> jnp.ndarray:
    """Hit@1 per sample on device (base_model.py:287-292)."""
    top1 = jnp.argmax(pred_dist, axis=-1)
    is_ans = jnp.take_along_axis((answer_dist > eps).astype(jnp.float32),
                                 top1[:, None], axis=1)[:, 0]
    return (is_ans > 0).astype(jnp.float32)
