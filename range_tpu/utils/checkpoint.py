"""Checkpoint save/restore for range_tpu params and training state.

The reference only *reads* checkpoints (Lightning .ckpt, CSP .pth.tar — see
convert/); its write side is Lightning's ModelCheckpoint
(`configs/default.yaml:11-15`) and name-encoded CSP model files
(`csp/main/utils.py:26-156`).  Here the native format is orbax (async-safe,
sharding-aware); `save_msgpack`/`load_msgpack` give a dependency-light
single-file alternative via flax serialization.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_orbax(path: str, state: Any) -> None:
    """Save a pytree (params / {params, opt_state, step}) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_orbax(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


def save_msgpack(path: str, state: Any) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_msgpack(path: str, template: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
