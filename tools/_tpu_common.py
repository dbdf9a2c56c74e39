"""Shared setup for the TPU experiment tools: persistent compilation cache
(first compiles over the tunnel cost 30-80s; cached reruns are instant) and
the standard informative-bank + query-tower fixture."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def standard_fixture(bank_n=100_000, b=10_240, seed=1):
    """(bank, q, q_xyz): informative autocorrelated bank + unit queries from
    the seeded SatCLIP tower (the honest-fidelity generator, RESULTS.md)."""
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    bank = GeoBank.synthetic_informative(0, bank_n, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, b),
         np.degrees(np.arcsin(rng.uniform(-1, 1, b)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    return bank, q, lonlat_deg_to_xyz(coords)


def fence(out):
    """Scalar-fetch fence: on the tunneled device block_until_ready can
    return before work completes; fetching one scalar is reliable."""
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def timeit(fn, *a, iters=60, **kw):
    """Best-of-3 steady-state ms/call at a DEEP dispatch queue.

    iters must be >= ~50: the tunnel's dispatch feed rate is ~3.5 ms/call
    at 10-deep queues (a trivial kernel measures 3.55 ms/call at iters=10
    but 0.29 ms at 200) — shallow loops measure the host feed rate, not
    the device.  Round-2's stage timings under ~4 ms were feed-limited."""
    import functools as _ft
    import time as _time

    f = _ft.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        s = _time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (_time.perf_counter() - s) / iters)
    return best * 1e3
