"""Failure detection for training: non-finite-loss guard with rollback.

The reference has no failure handling at all (SURVEY §5: its closest
artifacts are try/except around `.cpu().numpy()` calls).  Production training
on TPU pods wants at least: detect a non-finite loss/gradient step, skip the
update (in-graph, so the jitted step stays one program), and restore from the
last good snapshot after repeated failures.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


def guarded_step(step_fn: Callable) -> Callable:
    """Wrap `(params, opt_state, batch, rng) -> (params, opt_state, loss)` so
    that a non-finite loss keeps the previous (params, opt_state) — decided
    inside the compiled program with lax.cond-free select (no retrace, no
    host sync)."""

    def wrapped(params, opt_state, batch, rng):
        new_params, new_opt, loss = step_fn(params, opt_state, batch, rng)
        ok = jnp.isfinite(loss)

        def pick(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(ok, a, b) if hasattr(a, "dtype") else a,
                new, old)

        return pick(new_params, params), pick(new_opt, opt_state), loss

    return wrapped


@dataclasses.dataclass
class FailureMonitor:
    """Host-side escalation: count consecutive non-finite losses; after
    `patience` in a row, signal that training should restore from the last
    checkpoint (utils/checkpoint.py) and re-seed the data stream."""

    patience: int = 3
    consecutive: int = 0
    total: int = 0

    def observe(self, loss: float) -> bool:
        """Returns True when a restore is warranted."""
        import math

        if math.isfinite(loss):
            self.consecutive = 0
            return False
        self.consecutive += 1
        self.total += 1
        return self.consecutive >= self.patience
