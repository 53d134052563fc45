"""LoRA adapters for the TPU LLM.

Functional equivalent of the reference's peft usage: LoraConfig targeting
q_proj/v_proj (joint_finetuning.py:97-106) and the adapter-merge utility
(llm/src/utils/merge_peft.py:1-17). Adapters are a separate pytree of
(A, B) factors; ``merge_lora`` folds them into the base weights so the merged
checkpoint serves without adapter logic.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("q_proj", "v_proj")


def _match(path: str, targets: Sequence[str]) -> bool:
    return any(t in path for t in targets) and "kernel" in path


def init_lora(params, rng_key, r: int = 8, targets: Sequence[str] = DEFAULT_TARGETS):
    """Returns {path: {"a": [in, r], "b": [r, out]}} for matched kernels.
    A ~ N(0, 1/r), B = 0 (standard LoRA init: adapter starts as a no-op,
    with the random factor on the INPUT dim as in peft). TDense kernels are
    stored transposed [out, in] (model.py TDense), so d_in is shape[1] for
    2-D kernels; merge_lora transposes the delta back to the kernel layout."""
    lora = {}
    keys = jax.random.split(rng_key, 1024)
    i = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if not _match(name, targets):
            continue
        if leaf.ndim == 2:                       # TDense [out, in]
            d_out, d_in = int(leaf.shape[0]), int(leaf.shape[1])
        else:                                    # legacy [in, ...out]
            d_in = leaf.shape[0]
            d_out = int(np.prod(leaf.shape[1:]))
        a = jax.random.normal(keys[i], (d_in, r), jnp.float32) / r
        b = jnp.zeros((r, d_out), jnp.float32)
        lora[name] = {"a": a, "b": b}
        i += 1
    return lora


def merge_lora(params, lora, alpha: float = 16.0, r: int = 8):
    """Fold adapters into the base weights: W + (alpha/r) * A @ B."""
    scale = alpha / r

    def merge(path, leaf):
        name = jax.tree_util.keystr(path)
        if name not in lora:
            return leaf
        delta = (lora[name]["a"] @ lora[name]["b"]) * scale  # [in, out]
        if leaf.ndim == 2:                       # TDense [out, in]
            delta = delta.T
        return leaf + delta.reshape(leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def lora_train_step_factory(model, base_params, tx, alpha: float = 16.0,
                            r: int = 8):
    """Jitted SFT step that differentiates ONLY the adapters."""

    def train_step(lora, opt_state, tokens, loss_mask):
        def loss_fn(lora_p):
            p = merge_lora(base_params, lora_p, alpha, r)
            logits, _ = model.apply(p, tokens[:, :-1])
            targets = tokens[:, 1:]
            mask = loss_mask[:, 1:]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = jax.tree_util.tree_map(lambda p, u: p + u, lora, updates)
        return lora, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))
