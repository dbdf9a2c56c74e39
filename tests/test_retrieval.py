"""Retrieval correctness: streaming online-softmax vs dense numpy reference,
masking, state merging (sharded combine algebra), exact NN."""

import jax.numpy as jnp
import numpy as np

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.ops import retrieval


def _dense_reference(q_sem, q_xyz, locs, keys, values, sem_temp, geo_temp, beta, mode):
    """Direct numpy transcription of range.py:209-240 semantics."""

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    sem = softmax(sem_temp * (q_sem @ keys.T)) @ values
    if mode == "range":
        return sem
    xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(locs)))
    geo = softmax(geo_temp * (q_xyz @ xyz.T)) @ values
    return beta * sem + (1 - beta) * geo


def _setup(n=1000, b=16, dk=32, dv=64, seed=0, pad_to=128):
    rng = np.random.default_rng(seed)
    locs = np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1).astype(np.float32)
    keys = rng.standard_normal((n, dk)).astype(np.float32)
    values = rng.standard_normal((n, dv)).astype(np.float32)
    bank = GeoBank.from_arrays(locs, keys, values, pad_to=pad_to)
    q = rng.standard_normal((b, dk)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qlocs = np.stack([rng.uniform(-180, 180, b), rng.uniform(-90, 90, b)], 1).astype(np.float32)
    keys_n = keys / np.linalg.norm(keys, axis=1, keepdims=True)
    return locs, keys_n, values, bank, q, qlocs


def test_streaming_matches_dense_range_plus():
    locs, keys_n, values, bank, q, qlocs = _setup()
    q_xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(qlocs)))
    got = np.asarray(
        retrieval.retrieve(
            jnp.asarray(q), jnp.asarray(q_xyz), bank,
            sem_temp=12.0, geo_temp=40.0, beta=0.5, mode="range+", chunk=128,
        )
    )
    expect = _dense_reference(q, q_xyz, locs, keys_n, values, 12.0, 40.0, 0.5, "range+")
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_streaming_matches_dense_range():
    locs, keys_n, values, bank, q, _ = _setup(seed=1)
    got = np.asarray(
        retrieval.retrieve(jnp.asarray(q), None, bank,
                           sem_temp=15.0, mode="range", chunk=256)
    )
    expect = _dense_reference(q, None, locs, keys_n, values, 15.0, None, None, "range")
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_padding_is_masked():
    """Same data with different pad_to must give identical results."""
    locs, keys_n, values, bank_a, q, qlocs = _setup(n=777, pad_to=128)
    bank_b = GeoBank.from_arrays(locs, keys_n, values, pad_to=1024, normalized=True)
    q_xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(qlocs)))
    a = np.asarray(retrieval.retrieve(jnp.asarray(q), jnp.asarray(q_xyz), bank_a, chunk=128))
    b = np.asarray(retrieval.retrieve(jnp.asarray(q), jnp.asarray(q_xyz), bank_b, chunk=512))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_merge_states_is_exact():
    """Splitting the bank into halves and merging partial states must equal
    the single-pass result — this is the multi-chip combine invariant."""
    rng = np.random.default_rng(2)
    B, C, Dv = 8, 64, 16
    logits = rng.standard_normal((B, 4 * C)).astype(np.float32) * 5
    values = rng.standard_normal((4 * C, Dv)).astype(np.float32)

    full = retrieval.init_state(B, Dv)
    full = retrieval.update_state(full, jnp.asarray(logits), jnp.asarray(values))

    half_a = retrieval.init_state(B, Dv)
    half_a = retrieval.update_state(half_a, jnp.asarray(logits[:, : 2 * C]),
                                    jnp.asarray(values[: 2 * C]))
    half_b = retrieval.init_state(B, Dv)
    half_b = retrieval.update_state(half_b, jnp.asarray(logits[:, 2 * C :]),
                                    jnp.asarray(values[2 * C :]))
    merged = retrieval.merge_states(half_a, half_b)

    np.testing.assert_allclose(
        np.asarray(retrieval.finalize(merged)),
        np.asarray(retrieval.finalize(full)),
        rtol=1e-6, atol=1e-7,
    )


def test_exact_nn():
    locs, keys_n, values, bank, q, _ = _setup(n=500, b=32, seed=3, pad_to=128)
    got = np.asarray(retrieval.exact_nn(jnp.asarray(q), bank, chunk=128))
    expect = np.argmax(q @ keys_n.T, axis=1)
    np.testing.assert_array_equal(got, expect)


def test_bank_npz_roundtrip(tmp_path):
    bank = GeoBank.synthetic(0, 300, key_dim=16, value_dim=32, pad_to=128)
    path = str(tmp_path / "db.npz")
    bank.save_npz(path)
    loaded = GeoBank.from_npz(path, pad_to=64)
    assert int(loaded.n_valid) == 300
    np.testing.assert_allclose(
        np.asarray(loaded.keys_sem[:300]), np.asarray(bank.keys_sem[:300]), rtol=1e-6
    )
