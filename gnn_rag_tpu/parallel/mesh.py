"""Mesh construction and sharding rules.

The GNN stage's scale-out story (SURVEY.md §2.3): each chip holds the full
model (it is tiny — O(1M) params) and a shard of the *question batch*; large
relation tables / LM feature arrays can additionally be sharded over a tensor
axis. XLA GSPMD inserts the all-gathers/reduces; there is no hand-written
collective in the data path. The reference has no GNN parallelism at all
(single CUDA device, train_model.py:38).

Axes:
* ``dp`` — data parallel over questions (batch dim of every GraphBatch leaf);
* ``tp`` — tensor axis: relation-table rows and wide activation feature dims.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Every GraphBatch leaf is sharded on its leading (question) axis."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1
        else x, batch)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _param_spec(path: str, x, tp: int, min_shard_size: int) -> P:
    if x.ndim == 0 or x.size < min_shard_size or tp <= 1:
        return P()
    # shard the largest tp-divisible axis (embedding rows / wide features)
    axes = sorted(range(x.ndim), key=lambda a: -x.shape[a])
    for a in axes:
        if x.shape[a] % tp == 0 and x.shape[a] >= tp * 8:
            spec = [None] * x.ndim
            spec[a] = "tp"
            return P(*spec)
    return P()


def shard_params(mesh: Mesh, params, min_shard_size: int = 16_384):
    """Tensor-shard large tables over 'tp', replicate the rest (GSPMD)."""
    tp = mesh.shape["tp"]

    def place(path, x):
        spec = _param_spec(jax.tree_util.keystr(path), x, tp, min_shard_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_sharded_forward(model, params, rel_args, mesh: Mesh):
    """Data-parallel eval forward: params replicated, every GraphBatch leaf
    sharded over 'dp'. Returns forward_fn(batch) for train.Evaluator. The
    caller must pad batches to a multiple of the dp size
    (KGQADataset.make_batch(batch_pad_to=...))."""
    params = replicate(mesh, params)
    rel_args = tuple(replicate(mesh, (a,))[0] if a is not None else None
                     for a in rel_args)
    fwd = jax.jit(lambda p, b: model.apply(p, b, *rel_args))

    def forward_fn(batch):
        return fwd(params, shard_batch(mesh, batch))

    return forward_fn


def shard_rel_hidden(mesh: Mesh, rel_hidden):
    """Relation token-state tables [R+1, Lr, Dw] shard over rows on 'tp'."""
    if rel_hidden is None:
        return None
    R = rel_hidden.shape[0]
    tp = mesh.shape["tp"]
    spec = P("tp") if R % tp == 0 else P()
    return jax.device_put(rel_hidden, NamedSharding(mesh, spec))
