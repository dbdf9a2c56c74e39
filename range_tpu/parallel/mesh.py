"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY §2.10: the dead
rank/world_size fields in `satclip/loss_old.py:9-35` are its entire
footprint).  Parallelism here is designed TPU-first:

  * axis "data"  — batch/data parallelism (queries, training batches)
  * axis "bank"  — bank-row sharding for retrieval (model parallelism of the
    retrieval index); per-shard partial softmaxes combine exactly via the
    logsumexp algebra in ops/retrieval.py + psum.

A 1-D mesh uses whichever axis the workload needs; a 2-D mesh composes both
(e.g. 4 data x 2 bank on a v5e-8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "bank"),
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    Args:
      shape: per-axis sizes; None uses all devices on the first axis.
      axis_names: mesh axis names; truncated to len(shape).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices), 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])


def bank_sharding(mesh: Mesh, axis: str = "bank") -> NamedSharding:
    """Rows of the bank split along `axis`, feature dims replicated."""
    return NamedSharding(mesh, P(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))
