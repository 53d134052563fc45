"""Masked softmax over local entities.

Numerical contract matches the reference (reasongnn.py:130-131, 168-169):
``softmax(score + (1 - mask) * VERY_NEG_NUMBER)`` along the entity axis.
"""

import jax
import jax.numpy as jnp

VERY_NEG_NUMBER = -1e11  # reference: reasongnn.py:9 (-100000000000)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    scores = scores + (1.0 - mask) * VERY_NEG_NUMBER
    return jax.nn.softmax(scores, axis=axis)
