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


def load_pytree(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=target)
    from flax import serialization
    with open(path + ".msgpack" if not path.endswith(".msgpack") else path, "rb") as f:
        return serialization.from_bytes(target, f.read())
