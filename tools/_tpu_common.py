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
