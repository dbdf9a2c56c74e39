"""Autotuner: candidate selection, OOM skip, cache, fallback (CPU interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from range_tpu.bank.bank import GeoBank
from range_tpu.ops import autotune
from range_tpu.ops.autotune import autotune_retrieve, retrieve_autotuned


@pytest.fixture(scope="module")
def problem():
    bank = GeoBank.synthetic_device(0, 1024, key_dim=32, value_dim=64,
                                    pad_to=256)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    xyz = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return q, xyz, bank


def test_autotune_picks_and_caches(problem):
    q, xyz, bank = problem
    cache = {}
    choice = autotune_retrieve(q, xyz, bank, interpret=True, repeats=1,
                               candidates=[(64, 256), (64, 128)], cache=cache)
    assert choice in [(64, 256), (64, 128)]
    assert len(cache) == 1
    # second call must not re-probe: poison the timer to prove it
    orig = autotune._time_candidate
    autotune._time_candidate = None
    try:
        again = autotune_retrieve(q, xyz, bank, interpret=True, repeats=1,
                                  candidates=[(64, 256)], cache=cache)
    finally:
        autotune._time_candidate = orig
    assert again == choice


def test_autotune_skips_failures_and_falls_back(problem, monkeypatch):
    q, xyz, bank = problem

    def always_oom(*a, **k):
        raise RuntimeError("Mosaic failed: scoped vmem limit exceeded")

    monkeypatch.setattr(autotune, "_time_candidate", always_oom)
    choice = autotune_retrieve(q, xyz, bank, cache={},
                               candidates=[(64, 256), (128, 256)])
    assert choice == (256, 1024)  # safe default when every candidate dies

    calls = []

    def oom_for_big(q_sem, q_xyz, bank, *a):
        bm, bn = a[5], a[6]
        calls.append((bm, bn))
        if bn >= 256:
            raise RuntimeError("RESOURCE_EXHAUSTED: vmem")
        return 0.001

    monkeypatch.setattr(autotune, "_time_candidate", oom_for_big)
    choice = autotune_retrieve(q, xyz, bank, cache={},
                               candidates=[(64, 256), (64, 128)])
    assert choice == (64, 128) and len(calls) == 2


def test_retrieve_autotuned_matches_exact(problem):
    q, xyz, bank = problem
    from range_tpu.ops.retrieval import retrieve

    cache = {}
    # seed the cache so the wrapper path skips probing (fast in interpret)
    autotune_retrieve(q, xyz, bank, interpret=True, repeats=1,
                      candidates=[(64, 256)], cache=cache)
    autotune._CACHE.update(cache)
    try:
        out = retrieve_autotuned(q, xyz, bank, tier="exact", interpret=True)
        ref = retrieve(q, xyz, bank)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    finally:
        autotune._CACHE.clear()


def test_autotune_hier_picks_and_caches():
    """autotune_hier probes (bm, tc) candidates through the compiler oracle,
    returns a feasible pair, and caches per geometry (VERDICT r2 #5)."""
    import jax.numpy as jnp
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.autotune import autotune_hier
    from range_tpu.ops.retrieval_hier import build_hier_bank

    bank = GeoBank.synthetic_informative(0, 3000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((256, 256)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    q_xyz = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
    q_xyz = q_xyz / jnp.linalg.norm(q_xyz, axis=1, keepdims=True)

    cache = {}
    # tiny candidate list keeps the CPU interpret probe fast
    cands = ((128, 8), (128, 16))
    bm, tc = autotune_hier(q, q_xyz, hb, candidates=cands, repeats=1,
                           cache=cache, interpret=True)
    assert (bm, tc) in cands and hb.t_pad % tc == 0
    assert len(cache) == 1
    # second call is a pure cache hit (same geometry key)
    assert autotune_hier(q, q_xyz, hb, candidates=(), cache=cache,
                         interpret=True) == (bm, tc)


def test_arbitrate_mismatch_oracle_verdicts():
    """The miscompile arbitration (advisor r3 #4) must pick whichever side
    matches the interpret oracle — including demoting a DETERMINISTICALLY
    miscompiled first survivor — and stay conservative when the oracle
    can't separate them."""
    from range_tpu.ops.autotune import _arbitrate_mismatch

    gold = np.linspace(1.0, 2.0, 32).reshape(4, 8)
    good = gold * 1.001            # fp noise, within tol
    bad = gold.copy()
    bad[2, 3] *= 1.5               # one corrupt element, tc=32 style
    assert _arbitrate_mismatch(good, bad, gold) == "candidate"
    assert _arbitrate_mismatch(bad, good, gold) == "reference"
    assert _arbitrate_mismatch(good, gold, gold) == "unknown"   # both fine
    assert _arbitrate_mismatch(bad, bad * 1.2, gold) == "unknown"  # neither
