"""Sharded retrieval on a virtual 8-device CPU mesh: must equal single-device
results exactly (the logsumexp+psum combine is exact, not approximate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.ops import retrieval
from range_tpu.parallel.mesh import make_mesh
from range_tpu.parallel.sharded import shard_bank, sharded_retrieve


def _setup(n=2000, b=16, dk=32, dv=64, seed=0, pad_to=1024):
    rng = np.random.default_rng(seed)
    locs = np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1).astype(np.float32)
    keys = rng.standard_normal((n, dk)).astype(np.float32)
    values = rng.standard_normal((n, dv)).astype(np.float32)
    bank = GeoBank.from_arrays(locs, keys, values, pad_to=pad_to)
    q = rng.standard_normal((b, dk)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qlocs = np.stack([rng.uniform(-180, 180, b), rng.uniform(-90, 90, b)], 1).astype(np.float32)
    q_xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(qlocs)))
    return bank, jnp.asarray(q), jnp.asarray(q_xyz)


def test_8way_bank_shard_matches_single_device():
    assert len(jax.devices()) == 8
    bank, q, q_xyz = _setup()
    expect = np.asarray(
        retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                           beta=0.5, mode="range+", chunk=256)
    )
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(
        sharded_retrieve(q, q_xyz, sb, mesh, sem_temp=12.0, geo_temp=40.0,
                         beta=0.5, mode="range+", chunk=128)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_2d_mesh_data_and_bank():
    bank, q, q_xyz = _setup(n=1500, b=16, seed=1)
    expect = np.asarray(
        retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                           beta=0.25, mode="range+", chunk=512)
    )
    mesh = make_mesh((4, 2), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(
        sharded_retrieve(q, q_xyz, sb, mesh, sem_temp=12.0, geo_temp=40.0,
                         beta=0.25, mode="range+", chunk=256, data_axis="data")
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_sharded_range_mode():
    bank, q, _ = _setup(n=1024, seed=2)
    expect = np.asarray(retrieval.retrieve(q, None, bank, sem_temp=15.0, mode="range"))
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(
        sharded_retrieve(q, None, sb, mesh, sem_temp=15.0, mode="range", chunk=128)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_padding_entirely_on_last_shard():
    """n chosen so some shards are fully padding — must not produce NaNs."""
    bank, q, q_xyz = _setup(n=300, b=8, pad_to=1024, seed=3)  # shards 3..7 all pad
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(sharded_retrieve(q, q_xyz, sb, mesh, chunk=128))
    expect = np.asarray(retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=128))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_sharded_pallas_matches_single_device():
    """Multi-chip fused-kernel path (unnormalized partials + psum) equals the
    single-device streaming reference; kernel in interpret mode on the
    virtual CPU mesh."""
    from range_tpu.parallel.sharded import sharded_retrieve_pallas

    bank, q, q_xyz = _setup(n=1500, b=24, dk=32, dv=64, seed=5, pad_to=1024)
    expect = np.asarray(
        retrieval.retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                           beta=0.4, mode="range+", chunk=256)
    )
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(
        sharded_retrieve_pallas(q, q_xyz, sb, mesh, sem_temp=12.0,
                                geo_temp=40.0, beta=0.4, tier="high",
                                bm=8, bn=128, interpret=True)
    )
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_sharded_pallas_range_mode():
    from range_tpu.parallel.sharded import sharded_retrieve_pallas

    bank, q, _ = _setup(n=1024, seed=6)
    expect = np.asarray(retrieval.retrieve(q, None, bank, sem_temp=15.0,
                                           mode="range"))
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(bank, mesh)
    got = np.asarray(
        sharded_retrieve_pallas(q, None, sb, mesh, sem_temp=15.0, mode="range",
                                tier="high", bm=8, bn=128, interpret=True)
    )
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_sharded_retrieve_clustered_bank_valid_mask():
    """Scattered-validity (cluster-packed) banks through the jnp sharded path
    must match the single-device result (review fix: valid_mask was ignored)."""
    from range_tpu.bank.clustered import cluster_bank

    bank, q, q_xyz = _setup(n=900, b=16, dk=32, dv=32, seed=7, pad_to=128)
    cb, _ = cluster_bank(bank, bn=128)
    # pad cluster-packed rows to a multiple of 8 shards x 128
    rows = cb.num_rows
    target = ((rows + 1023) // 1024) * 1024
    if target != rows:
        import jax.numpy as jnp

        def pad(x, width):
            return jnp.pad(x, ((0, width), *[(0, 0)] * (x.ndim - 1)))

        from range_tpu.bank.bank import GeoBank

        cb = GeoBank(
            locs_lonlat=pad(cb.locs_lonlat, target - rows),
            xyz=pad(cb.xyz, target - rows),
            keys_sem=pad(cb.keys_sem, target - rows),
            values=pad(cb.values, target - rows),
            n_valid=cb.n_valid,
            valid_mask=pad(cb.valid_mask, target - rows),
        )
    expect = np.asarray(retrieval.retrieve(q, q_xyz, cb, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=128))
    mesh = make_mesh((1, 8), ("data", "bank"))
    sb = shard_bank(cb, mesh)
    got = np.asarray(sharded_retrieve(q, q_xyz, sb, mesh, sem_temp=12.0,
                                      geo_temp=40.0, beta=0.5, chunk=128))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_save_npz_clustered_roundtrip(tmp_path):
    """save_npz on a scattered-mask bank keeps exactly the valid rows
    (review fix: prefix slicing lost/corrupted rows)."""
    from range_tpu.bank.clustered import cluster_bank

    bank, _, _ = _setup(n=900, dk=16, dv=16, seed=8, pad_to=128)
    cb, _ = cluster_bank(bank, bn=128)
    path = str(tmp_path / "db.npz")
    cb.save_npz(path)
    loaded = np.load(path)
    assert loaded["locs"].shape == (900, 2)
    assert np.all(np.isfinite(loaded["satclip_embeddings"]))
    # same multiset of key rows as the original bank's valid rows
    orig = np.sort(np.asarray(bank.keys_sem[:900]).round(5).sum(1))
    got = np.sort(loaded["satclip_embeddings"].round(5).sum(1))
    np.testing.assert_allclose(got, orig, rtol=1e-4)


def test_sharded_retrieve_quantized_bank():
    """int8-quantized banks shard (scale rows live on axis 1) and both
    sharded paths match the single-device exact result within quantization
    tolerance."""
    from range_tpu.bank.bank import GeoBank, quantize_values
    from range_tpu.parallel.sharded import (shard_bank, sharded_retrieve,
                                            sharded_retrieve_pallas)
    from range_tpu.ops.retrieval import retrieve

    mesh = make_mesh((1, 8), ("data", "bank"))
    bank = GeoBank.synthetic(11, 1800, key_dim=32, value_dim=64, pad_to=2048)
    qb = shard_bank(quantize_values(bank), mesh)
    assert qb.value_scale is not None
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    xyz = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    ref = np.asarray(retrieve(q, xyz, bank))
    out = np.asarray(sharded_retrieve(q, xyz, qb, mesh))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 0.05, rel.max()

    outp = np.asarray(sharded_retrieve_pallas(q, xyz, qb, mesh, bm=16,
                                              bn=256, interpret=True))
    relp = np.abs(outp - ref) / np.maximum(np.abs(ref), 1e-1)
    assert relp.max() < 0.05, relp.max()


def test_sharded_hier_all_tiles_exact():
    """sharded_retrieve_hier with every local tile selected must equal the
    exact dense computation (each shard computes exact partials over its
    rows; the tail covers only zero pad tiles; psum combine is linear)."""
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8)
    assert hb.t_pad % 8 == 0 and hb.k_cat.shape[0] == hb.t_pad * hb.bn
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)

    rng = np.random.default_rng(4)
    locs = np.stack([rng.uniform(-180, 180, 256),
                     rng.uniform(-80, 80, 256)], 1).astype(np.float32)
    q = rng.standard_normal((256, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))

    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=512))
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=hb.t_pad // 8, bm=128,
        tc=hb.t_pad // 8 if (hb.t_pad // 8) <= 8 else 8, interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()


def test_sharded_hier_asym_k_geo_all_tiles_exact():
    """The asymmetric family-budget path (k_geo > 0) through
    sharded_retrieve_hier: with BOTH per-shard budgets covering every local
    tile it must equal the exact dense computation, proving the k_geo
    plumbing reaches _hier_partials on the mesh path (the flagship serving
    config uses k_geo)."""
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)

    rng = np.random.default_rng(4)
    locs = np.stack([rng.uniform(-180, 180, 256),
                     rng.uniform(-80, 80, 256)], 1).astype(np.float32)
    q = rng.standard_normal((256, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))

    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=512))
    t_local = hb.t_pad // 8
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=t_local, k_geo=t_local, bm=128,
        tc=t_local if t_local <= 8 else 8, interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()


def test_sharded_hier_partial_selection_close():
    """Per-shard K < t_local: approximate but close to dense (the union of
    per-shard selections is finer than single-chip selection at equal
    total K)."""
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    import sys
    sys.path.insert(0, "tests")
    from test_hier import _make_queries

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)
    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=6)
    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=512))
    t_local = hb.t_pad // 8
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=max(2, t_local // 2), bm=128,
        tc=min(8, t_local), interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.mean() < 0.05, rel.mean()


def test_sharded_hier_topk_exact_and_k():
    """sharded_hier_topk with every local tile selected equals single-device
    hier_topk (k=1: the pmax/argmax combine; k=4: the all_gather + global
    top-k merge) — per VERDICT r2 item 3."""
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import build_hier_bank, hier_topk
    from range_tpu.ops.topk import topk_sem
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_hier_topk)
    from range_tpu.bank.bank import GeoBank
    import sys
    sys.path.insert(0, "tests")
    from test_hier import _make_queries

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)
    t_local = hb.t_pad // 8

    q, q_xyz = _make_queries(bank, regional=False, B=256, seed=11)
    true = np.asarray(exact_nn(q, hb.bank, chunk=512))
    got1 = np.asarray(sharded_hier_topk(
        q, q_xyz, shb, mesh, k=1, k_tiles=t_local, bm=128,
        tc=min(8, t_local), interpret=True))
    assert got1.shape == (256,)
    assert (got1 == true).mean() >= 0.995, (got1 != true).sum()

    k = 4
    _, true_k = topk_sem(q, hb.bank, k=k, chunk=512)
    gotk = np.asarray(sharded_hier_topk(
        q, q_xyz, shb, mesh, k=k, k_tiles=t_local, bm=128,
        tc=min(8, t_local), interpret=True))
    assert gotk.shape == (256, k)
    assert (gotk == np.asarray(true_k)).mean() >= 0.99

    # partial per-shard selection in the coherent regime stays high-recall
    qr, qr_xyz = _make_queries(bank, regional=True, B=256, seed=12)
    true_r = np.asarray(exact_nn(qr, hb.bank, chunk=512))
    # per-shard budget 3/4 of the local slab (at this toy scale each
    # shard owns only ~6 real tiles, so a halved budget cuts hot tiles
    # a real bank's selection would keep; bench.py measures real scale)
    got_p = np.asarray(sharded_hier_topk(
        qr, qr_xyz, shb, mesh, k=1, k_tiles=max(2, t_local * 3 // 4),
        bm=128, tc=min(8, t_local), interpret=True))
    assert (got_p == true_r).mean() >= 0.95, (got_p != true_r).sum()


def test_sharded_hier2_two_level():
    """Two-level banks under the mesh: sharded_retrieve_hier all-tiles is
    exact, and sharded_hier_topk's two-phase selection matches exact NN."""
    from range_tpu.ops.retrieval import exact_nn, retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_hier_topk,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    import sys
    sys.path.insert(0, "tests")
    from test_hier import _make_queries

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, gsz_super=16,
                         tier="exact", value_dtype=jnp.float32, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)
    t_local = hb.t_pad // 8

    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=13)
    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=t_local, m_tiles=t_local, bm=128,
        tc=min(8, t_local), interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()

    qs, qs_xyz = _make_queries(bank, regional=False, B=256, seed=14)
    true = np.asarray(exact_nn(qs, hb.bank, chunk=512))
    got = np.asarray(sharded_hier_topk(
        qs, qs_xyz, shb, mesh, k=1, k_tiles=t_local, m_tiles=t_local,
        bm=128, tc=min(8, t_local), interpret=True))
    assert (got == true).mean() >= 0.995, (got != true).sum()


def test_sharded_hier_res_rank_matches_single_device():
    """Residual-rank parts through the mesh path: the sharded partials (az
    in residual coords, alr in lr coords, both linear in bank rows) psum to
    the single-device result; at res_rank >= Dv this also matches the plain
    (non-res) sharded path."""
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512, value_dim=64)
    Dv = bank.value_dim
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8,
                         lr_rank=Dv, res_rank=Dv)
    assert hb.res_rank == Dv and hb.z_sem is not None
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)

    rng = np.random.default_rng(4)
    locs = np.stack([rng.uniform(-180, 180, 256),
                     rng.uniform(-80, 80, 256)], 1).astype(np.float32)
    q = rng.standard_normal((256, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))

    single = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=6, k_geo=4,
                                      bm=128, interpret=True))
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=6, k_geo=4, bm=128, tc=8,
        interpret=True))
    # per-shard selection differs from single-device selection (finer
    # union), so compare against the exact reference instead of bitwise
    from range_tpu.ops.retrieval import retrieve

    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))

    def relerr(a):
        return (np.abs(a - ref) / np.maximum(np.abs(ref), 1e-1)).mean()

    assert np.isfinite(out).all()
    # sharded selection is strictly finer: its error must not exceed the
    # single-device error by more than fp noise
    assert relerr(out) <= relerr(single) * 1.05 + 1e-4, (
        relerr(out), relerr(single))


def test_sharded_hier_lr_geo_and_tail_super():
    """Round-4 operands through the mesh path: lr_geo (caught a real bug —
    u_geo must be REPLICATED in _hier_bank_spec, not row-sliced) and
    tail_super (per-shard supergroup tail + per-shard correction cover;
    partials stay linear, so the psum combine is unchanged)."""
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512, value_dim=64)
    Dv = bank.value_dim
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, shards=8,
                         lr_rank=Dv, lr_geo=Dv, res_rank=Dv, tail_super=32)
    assert hb.lr_geo == Dv and hb.g_sem_ts_vw is not None
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)

    rng = np.random.default_rng(4)
    locs = np.stack([rng.uniform(-180, 180, 256),
                     rng.uniform(-80, 80, 256)], 1).astype(np.float32)
    q = rng.standard_normal((256, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))

    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))
    single = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=6, k_geo=4,
                                      m_corr=4, bm=128, interpret=True))
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=6, k_geo=4, m_corr=4, bm=128, tc=8,
        interpret=True))

    def relerr(a):
        return (np.abs(a - ref) / np.maximum(np.abs(ref), 1e-1)).mean()

    # per-shard union selection is strictly finer than single-device at
    # the same per-shard K
    assert relerr(out) <= relerr(single) + 1e-6
    assert relerr(out) < 0.08, relerr(out)


def test_sharded_hier_full_flagship_kwarg_surface():
    """Mesh/single-chip FEATURE parity over the FULL flagship kwarg surface
    (VERDICT r4 #5): lr_rank + lr_geo + res_rank family-split partials,
    scan_bm, adaptive rescue, tile dedup, and the fused combine+concat
    epilogue (raw partials psum + replicated combine kernel).  With every
    local tile selected both paths must equal the exact dense computation;
    output carries the [retrieved | query] concat contract."""
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512, value_dim=128)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, lr_rank=128, lr_geo=128,
                         res_rank=128, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)

    rng = np.random.default_rng(4)
    B = 512
    locs = np.stack([rng.uniform(-180, 180, B),
                     rng.uniform(-80, 80, B)], 1).astype(np.float32)
    q = rng.standard_normal((B, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))

    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))
    t_local = hb.t_pad // 8
    kw = dict(bm=128, scan_bm=256, concat_query=q, adaptive_frac=0.1,
              adaptive_mult=2, dedup=2, k_union=None, interpret=True)
    out_m = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=t_local, k_geo=t_local,
        tc=min(8, t_local), **kw))
    out_1 = np.asarray(retrieve_hier(
        q, q_xyz, hb, k_tiles=hb.t_real, k_geo=hb.t_real, **kw))
    assert out_m.shape == (B, 128 + 256)
    # both concat the query verbatim
    np.testing.assert_allclose(out_m[:, 128:], np.asarray(q), atol=1e-6)
    np.testing.assert_allclose(out_1[:, 128:], np.asarray(q), atol=1e-6)
    for out in (out_m, out_1):
        rel = np.abs(out[:, :128] - ref) / np.maximum(np.abs(ref), 1e-1)
        assert rel.max() < 5e-3, rel.max()
    # mesh vs single-chip agree to fp-combine tolerance at exactness config
    rel_ms = (np.abs(out_m - out_1) / np.maximum(np.abs(out_1), 1e-1)).max()
    assert rel_ms < 5e-3, rel_ms


def test_sharded_hier_flagship_partial_close_to_single():
    """Partial selection with the full kwarg surface: the mesh path's
    feature error vs exact stays in the single-chip path's error class
    (the per-shard union selection is finer at equal total K)."""
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier
    from range_tpu.parallel.sharded import (shard_hier_bank,
                                            sharded_retrieve_hier)
    from range_tpu.bank.bank import GeoBank
    import sys
    sys.path.insert(0, "tests")
    from test_hier import _make_queries

    bank = GeoBank.synthetic_informative(0, 6000, pad_to=512, value_dim=128)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, lr_rank=128, lr_geo=128,
                         res_rank=128, shards=8)
    mesh = make_mesh((8,), ("bank",))
    shb = shard_hier_bank(hb, mesh)
    q, q_xyz = _make_queries(bank, regional=True, B=512, seed=6)
    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))
    kw = dict(bm=128, scan_bm=256, concat_query=q, adaptive_frac=0.05,
              adaptive_mult=2, dedup=2, interpret=True)
    # per-shard budgets: t_local is only 8 tiles here (6000 rows / bn=128 /
    # 8 shards), so k_tiles=4 per shard = half of each shard's slab — the
    # mesh analogue of the single-chip K=16 of 48 real tiles
    t_local = hb.t_pad // 8
    out_m = np.asarray(sharded_retrieve_hier(
        q, q_xyz, shb, mesh, k_tiles=4, k_geo=2,
        j_sem=3, tc=min(8, t_local), **kw))[:, :128]
    out_1 = np.asarray(retrieve_hier(
        q, q_xyz, hb, k_tiles=16, k_geo=8, j_sem=3, **kw))[:, :128]
    den = np.maximum(np.abs(ref), 1e-1)
    rel_m = (np.abs(out_m - ref) / den).mean()
    rel_1 = (np.abs(out_1 - ref) / den).mean()
    assert rel_m < max(2 * rel_1, 0.05), (rel_m, rel_1)
