"""Fused Pallas retrieval kernel vs the streaming jnp reference — interpret
mode on CPU (the compiled kernel is exercised on real TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.ops import retrieval
from range_tpu.ops.retrieval_pallas import retrieve_pallas


def _setup(n=1024, b=24, dv=64, seed=0, pad_to=512):
    rng = np.random.default_rng(seed)
    locs = np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1).astype(np.float32)
    keys = rng.standard_normal((n, 256)).astype(np.float32)
    values = rng.standard_normal((n, dv)).astype(np.float32)
    bank = GeoBank.from_arrays(locs, keys, values, pad_to=pad_to)
    q = rng.standard_normal((b, 256)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qlocs = np.stack([rng.uniform(-180, 180, b), rng.uniform(-90, 90, b)], 1).astype(np.float32)
    q_xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(qlocs)))
    return bank, jnp.asarray(q), jnp.asarray(q_xyz)


def test_fused_matches_reference_range_plus():
    bank, q, q_xyz = _setup()
    expect = np.asarray(
        retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                           beta=0.5, mode="range+", chunk=256)
    )
    exact = np.asarray(
        retrieve_pallas(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                        mode="range+", tier="exact", bm=16, bn=256, interpret=True)
    )
    np.testing.assert_allclose(exact, expect, rtol=2e-5, atol=2e-6)
    high = np.asarray(
        retrieve_pallas(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                        mode="range+", tier="high", bm=16, bn=256, interpret=True)
    )
    np.testing.assert_allclose(high, expect, rtol=1e-3, atol=2e-4)
    fast = np.asarray(
        retrieve_pallas(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                        mode="range+", tier="fast", bm=16, bn=256, interpret=True)
    )
    np.testing.assert_allclose(fast, expect, rtol=1e-1, atol=5e-2)


def test_fused_matches_reference_range():
    bank, q, _ = _setup(seed=1)
    expect = np.asarray(
        retrieval.retrieve(q, None, bank, sem_temp=15.0, mode="range", chunk=256)
    )
    high = np.asarray(
        retrieve_pallas(q, None, bank, sem_temp=15.0, mode="range",
                        tier="high", bm=16, bn=256, interpret=True)
    )
    np.testing.assert_allclose(high, expect, rtol=1e-3, atol=2e-4)
    fast = np.asarray(
        retrieve_pallas(q, None, bank, sem_temp=15.0, mode="range",
                        tier="fast", bm=16, bn=256, interpret=True)
    )
    # bf16 sem logits: ~15*2^-8 ~ 0.06 logit error -> few-% weight error
    np.testing.assert_allclose(fast, expect, rtol=5e-2, atol=2e-2)


def test_fused_masks_padding():
    bank, q, q_xyz = _setup(n=700, pad_to=512, seed=2)  # 324 pad rows
    expect = np.asarray(retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.3, chunk=256))
    got = np.asarray(
        retrieve_pallas(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0, beta=0.3,
                        bm=16, bn=256, interpret=True)
    )
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=2e-4)


def test_fused_batch_not_multiple_of_bm():
    bank, q, q_xyz = _setup(b=19, seed=3)
    expect = np.asarray(retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=256))
    got = np.asarray(
        retrieve_pallas(q, q_xyz, bank, bm=16, bn=256, interpret=True)
    )
    assert got.shape == expect.shape == (19, 64)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=2e-4)


def test_fused_bf16_values_close():
    """bf16 VALUES (the production config): logits stay f32 inside the
    kernel, so errors are bounded by value rounding (~1%)."""
    bank, q, q_xyz = _setup(seed=4)
    bank16 = GeoBank(
        locs_lonlat=bank.locs_lonlat,
        xyz=bank.xyz,
        keys_sem=bank.keys_sem,
        values=bank.values.astype(jnp.bfloat16),
        n_valid=bank.n_valid,
    )
    expect = np.asarray(retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=256))
    got = np.asarray(
        retrieve_pallas(q, q_xyz, bank16, bm=16, bn=256, interpret=True)
    )
    err = np.abs(got - expect) / np.maximum(np.abs(expect), 1e-1)
    assert err.max() < 0.02, err.max()


def test_int8_value_kernel_matches_exact():
    """bank.quantize_values -> int8-value kernel path: same softmax weights
    (keys untouched), retrieved features within quantization tolerance."""
    from range_tpu.bank.bank import GeoBank, dequantize_values, quantize_values

    bank = GeoBank.synthetic(0, 900, key_dim=64, value_dim=128, pad_to=256)
    qb = quantize_values(bank)
    assert qb.values.dtype == jnp.int8
    assert qb.value_scale.shape == (1, bank.num_rows)
    assert quantize_values(qb) is qb  # idempotent
    # dequantization error bounded by scale/2 per element
    deq = np.asarray(dequantize_values(qb))
    scale = np.asarray(qb.value_scale)[0]
    assert np.all(np.abs(deq - np.asarray(bank.values)) <= scale[:, None] * 0.51)

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    xyz = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    ref = np.asarray(retrieval.retrieve(q, xyz, bank))
    out = np.asarray(retrieve_pallas(q, xyz, qb, tier="exact", bm=32, bn=256,
                                     interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 0.05 and rel.mean() < 0.01, (rel.max(), rel.mean())


def test_quantized_bank_save_npz_dequantizes(tmp_path):
    from range_tpu.bank.bank import GeoBank, quantize_values

    bank = GeoBank.synthetic(3, 100, key_dim=16, value_dim=32, pad_to=64)
    qb = quantize_values(bank)
    p = str(tmp_path / "qb.npz")
    qb.save_npz(p)
    db = np.load(p)
    orig = np.asarray(bank.values)[:100]
    assert db["image_embeddings"].shape == (100, 32)
    # round-trips real magnitudes, not raw int8 codes
    np.testing.assert_allclose(db["image_embeddings"], orig, atol=0.02)


def test_from_npz_device_matches_host_load(tmp_path):
    from range_tpu.bank.bank import GeoBank, from_npz_device

    src = GeoBank.synthetic(7, 300, key_dim=16, value_dim=32, pad_to=128)
    p = str(tmp_path / "db.npz")
    src.save_npz(p)
    host = GeoBank.from_npz(p, pad_to=128)
    dev = from_npz_device(p, pad_to=128)
    assert dev.num_rows == host.num_rows and int(dev.n_valid) == 300
    np.testing.assert_allclose(np.asarray(dev.keys_sem),
                               np.asarray(host.keys_sem), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev.xyz), np.asarray(host.xyz),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev.values),
                               np.asarray(host.values), rtol=1e-6, atol=1e-6)
