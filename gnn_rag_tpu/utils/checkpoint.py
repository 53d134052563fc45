"""Checkpointing: orbax pytree save/restore with a flax-serialization
fallback (reference equivalent: torch.save/load of model_state_dict,
train_model.py:236-253)."""

from __future__ import annotations

import os
from typing import Any


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path, ignore_errors=True)
        ckptr.save(path, tree)
        ckptr.wait_until_finished()
    except Exception:
        from flax import serialization
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(tree))


def load_pytree(path: str, target: Any, partial: bool = False) -> Any:
    """Restore a pytree. With ``partial=True``, leaves present in the
    checkpoint override matching paths in ``target`` and everything else is
    kept — the reference's load_state_dict(strict=False) semantics
    (train_model.py:252)."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import jax
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        if not partial:
            return ckptr.restore(path, target=target)
        # partial overlay: the checkpoint tree may differ from target, so
        # restore it standalone — but via an abstract target built from the
        # checkpoint's own metadata, NOT targetless: a targetless restore
        # re-applies the sharding metadata of the saving machine and fails
        # on a different topology ("Device TPU v5 lite0 was not found")
        try:
            meta = ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", meta)
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            abstract = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding), tree)
            raw = ckptr.restore(path, target=abstract)
        except Exception:
            raw = ckptr.restore(path)
        return merge_pytrees(target, raw)
    from flax import serialization
    fpath = path + ".msgpack" if not path.endswith(".msgpack") else path
    with open(fpath, "rb") as f:
        data = f.read()
    if not partial:
        return serialization.from_bytes(target, data)
    raw = serialization.msgpack_restore(data)
    return merge_pytrees(target, serialization.from_state_dict(target, raw)
                         if _same_structure(target, raw) else raw)


def validate_shapes(restored: Any, target: Any, context: str = "") -> Any:
    """Fail FAST and clearly when a restored tree's leaf shapes disagree with
    the model's init shapes — e.g. a pre-TDense bf16 bundle (DenseGeneral
    [in, out] kernels) restored into the transposed [out, in] layout
    (model.py TDense). Without this the mismatch only surfaces later as an
    opaque dot_general shape error at apply time."""
    import jax
    import numpy as np

    bad = []

    def chk(path, r, t):
        rs, ts = tuple(np.shape(r)), tuple(np.shape(t))
        if rs != ts:
            bad.append(f"{jax.tree_util.keystr(path)}: checkpoint {rs} "
                       f"vs model {ts}")
        return r

    jax.tree_util.tree_map_with_path(chk, restored, target)
    if bad:
        raise ValueError(
            f"checkpoint layout mismatch{' (' + context + ')' if context else ''}: "
            + "; ".join(bad[:4])
            + (f"; +{len(bad) - 4} more" if len(bad) > 4 else "")
            + ". 2-D kernels transposed => a pre-TDense (r3) bundle: retrain "
              "it or transpose its 2-D kernels into the [out, in] layout.")
    return restored


def _same_structure(target, raw) -> bool:
    import jax
    try:
        jax.tree_util.tree_map(lambda a, b: None, target, raw)
        return True
    except Exception:
        return False


def merge_pytrees(target: Any, source: Any) -> Any:
    """Overlay source leaves onto target where the nested path exists and the
    shapes match; keep target leaves elsewhere."""
    import numpy as np

    if isinstance(target, dict) and isinstance(source, dict):
        out = {}
        for k, v in target.items():
            out[k] = merge_pytrees(v, source[k]) if k in source else v
        return out
    if hasattr(target, "shape") and hasattr(source, "shape"):
        if tuple(target.shape) == tuple(np.shape(source)):
            return source
        return target
    return source if source is not None else target
