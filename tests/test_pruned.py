"""Clustered-bank pruned retrieval: bound soundness, fidelity vs exact,
pruning actually prunes on clustered data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from range_tpu.bank.bank import GeoBank
from range_tpu.bank.clustered import cluster_bank, compute_tile_plan, tile_stats
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.ops import retrieval
from range_tpu.ops.kmeans import kmeans
from range_tpu.ops.retrieval_pallas import retrieve_pruned


def _clustered_bank(n=3000, n_centers=24, key_dim=64, dv=32, seed=0, pad_to=512):
    """Spatially clustered locations; keys correlated with location (vMF-ish)
    — the structure real S2-100K banks have."""
    rng = np.random.default_rng(seed)
    centers_lon = rng.uniform(-180, 180, n_centers)
    centers_lat = rng.uniform(-60, 60, n_centers)
    which = rng.integers(0, n_centers, n)
    lons = centers_lon[which] + rng.normal(0, 3, n)
    lats = centers_lat[which] + rng.normal(0, 3, n)
    locs = np.stack([np.clip(lons, -180, 180), np.clip(lats, -90, 90)], 1)
    key_centers = rng.standard_normal((n_centers, key_dim)) * 3
    keys = key_centers[which] + rng.standard_normal((n, key_dim))
    values = rng.standard_normal((n, dv)).astype(np.float32)
    return GeoBank.from_arrays(locs.astype(np.float32), keys.astype(np.float32),
                               values, pad_to=pad_to)


def _queries(bank, b=64, seed=1):
    rng = np.random.default_rng(seed)
    # queries near bank points (the realistic case)
    pick = rng.integers(0, int(bank.n_valid), b)
    locs = np.asarray(bank.locs_lonlat[pick]) + rng.normal(0, 1, (b, 2))
    locs[:, 0] = np.clip(locs[:, 0], -180, 180)
    locs[:, 1] = np.clip(locs[:, 1], -90, 90)
    q = np.asarray(bank.keys_sem[pick]) + 0.05 * rng.standard_normal(
        (b, bank.key_dim)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(lonlat_deg_to_xyz(jnp.asarray(locs, jnp.float32)))


def test_kmeans_clusters():
    rng = np.random.default_rng(0)
    centers = np.eye(4, 8) * 5
    pts = np.repeat(centers, 50, axis=0) + 0.1 * rng.standard_normal((200, 8))
    c, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts, jnp.float32), 4,
                       iters=10)
    # points from the same generator cluster share an assignment
    a = np.asarray(assign).reshape(4, 50)
    for row in a:
        assert len(np.unique(row)) == 1
    assert len(np.unique(a[:, 0])) == 4


def test_tile_plan_bounds_sound():
    """Every tile containing a query's exact argmax row must be kept."""
    bank = _clustered_bank()
    cb, stats = cluster_bank(bank, bn=128)
    q_sem, q_xyz = _queries(cb, b=64)
    idx, counts = compute_tile_plan(q_sem, stats.sem_centroid,
                                    stats.sem_radius, temp=12.0, bm=16,
                                    margin=0.0)
    true_nn = np.asarray(retrieval.exact_nn(q_sem, cb, chunk=128))
    true_tile = true_nn // 128
    idx_np, counts_np = np.asarray(idx), np.asarray(counts)
    for qi in range(64):
        row = qi // 16
        kept = set(idx_np[row, :counts_np[row]])
        assert true_tile[qi] in kept, (qi, true_tile[qi], counts_np[row])


def test_pruned_matches_dense():
    bank = _clustered_bank()
    cb, stats = cluster_bank(bank, bn=128)
    q_sem, q_xyz = _queries(cb, b=48, seed=2)
    expect = np.asarray(retrieval.retrieve(q_sem, q_xyz, cb, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=128))
    got = np.asarray(retrieve_pruned(q_sem, q_xyz, cb, stats, sem_temp=12.0,
                                     geo_temp=40.0, beta=0.5, tier="high",
                                     bm=16, bn=128, margin=20.0, interpret=True))
    err = np.abs(got - expect) / np.maximum(np.abs(expect), 1e-1)
    assert err.max() < 5e-3, err.max()


def test_pruning_is_effective_on_clustered_data():
    """Realistic serving shape: a large bank and a spatially concentrated
    query batch (eval datasets batch regionally once sorted).  Globally
    uniform queries at geo temp 40 keep a ~60deg cap each (~25% of a uniform
    bank) — the bound is tight, the workload just isn't prunable then."""
    bank = _clustered_bank(n=20000, n_centers=64, seed=7, pad_to=256)
    cb, stats = cluster_bank(bank, bn=256, rows_per_cluster=256)
    # queries concentrated around a handful of bank rows (regional batch)
    rng = np.random.default_rng(3)
    anchors = np.asarray(cb.locs_lonlat[rng.integers(0, 20000, 4)])
    locs = np.repeat(anchors, 128, axis=0) + rng.normal(0, 2, (512, 2))
    locs[:, 0] = np.clip(locs[:, 0], -180, 180)
    locs[:, 1] = np.clip(locs[:, 1], -90, 90)
    q_xyz = jnp.asarray(lonlat_deg_to_xyz(jnp.asarray(locs, jnp.float32)))
    pick = rng.integers(0, 20000, 512)
    q_sem = np.asarray(cb.keys_sem[pick]) + 0.05 * rng.standard_normal(
        (512, cb.key_dim)).astype(np.float32)
    q_sem = jnp.asarray(q_sem / np.linalg.norm(q_sem, axis=1, keepdims=True))
    T = cb.num_rows // 256
    # spatially sort queries first (retrieve_pruned does this internally):
    # the keep decision is per query-TILE, so tiles must be coherent
    lat = np.arcsin(np.clip(np.asarray(q_xyz)[:, 2], -1, 1))
    lon = np.arctan2(np.asarray(q_xyz)[:, 1], np.asarray(q_xyz)[:, 0])
    order = np.argsort(np.floor((lat + np.pi / 2) / (np.pi / 12)) * 10 + lon / np.pi)
    q_sem_s, q_xyz_s = q_sem[order], q_xyz[order]
    _, cnt_g = compute_tile_plan(q_xyz_s, stats.geo_centroid, stats.geo_radius,
                                 temp=40.0, bm=64, margin=20.0)
    frac_g = float(np.mean(np.asarray(cnt_g)) / T)
    assert frac_g < 0.7, frac_g  # geo at temp 40 prunes hard
    _, cnt_s = compute_tile_plan(q_sem_s, stats.sem_centroid, stats.sem_radius,
                                 temp=12.0, bm=64, margin=20.0)
    frac_s = float(np.mean(np.asarray(cnt_s)) / T)
    assert frac_s <= 1.0  # sem prunes only as far as key autocorrelation allows
    print("geo frac", frac_g, "sem frac", frac_s)


def test_pruned_range_mode():
    bank = _clustered_bank(seed=4)
    cb, stats = cluster_bank(bank, bn=128)
    q_sem, _ = _queries(cb, b=32, seed=5)
    expect = np.asarray(retrieval.retrieve(q_sem, None, cb, sem_temp=15.0,
                                           mode="range", chunk=128))
    got = np.asarray(retrieve_pruned(q_sem, None, cb, stats, sem_temp=15.0,
                                     mode="range", tier="high", bm=16, bn=128,
                                     margin=20.0, interpret=True))
    err = np.abs(got - expect) / np.maximum(np.abs(expect), 1e-1)
    assert err.max() < 5e-3, err.max()


def test_hybrid_matches_dense():
    from range_tpu.ops.retrieval_pallas import retrieve_hybrid

    bank = _clustered_bank()
    cb, stats = cluster_bank(bank, bn=128)
    q_sem, q_xyz = _queries(cb, b=48, seed=6)
    expect = np.asarray(retrieval.retrieve(q_sem, q_xyz, cb, sem_temp=12.0,
                                           geo_temp=40.0, beta=0.5, chunk=128))
    got = np.asarray(retrieve_hybrid(q_sem, q_xyz, cb, stats, sem_temp=12.0,
                                     geo_temp=40.0, beta=0.5, tier="high",
                                     bm=16, bn=128, margin=20.0, interpret=True))
    err = np.abs(got - expect) / np.maximum(np.abs(expect), 1e-1)
    assert err.max() < 5e-3, err.max()


def test_cluster_bank_preserves_value_scale():
    from range_tpu.bank.bank import GeoBank, dequantize_values, quantize_values
    from range_tpu.bank.clustered import cluster_bank

    bank = GeoBank.synthetic(5, 500, key_dim=16, value_dim=32, pad_to=256)
    qb = quantize_values(bank)
    clustered, _ = cluster_bank(qb, n_clusters=4, bn=128, seed=0)
    assert clustered.value_scale is not None
    assert clustered.value_scale.shape == (1, clustered.num_rows)
    # dequantized rows must match the original rows (reordered)
    deq = np.asarray(dequantize_values(clustered))
    orig = np.asarray(bank.values)
    sel = np.asarray(clustered.valid_mask) > 0
    # every valid clustered row appears in the original bank
    locs_c = np.asarray(clustered.locs_lonlat)[sel]
    locs_o = np.asarray(bank.locs_lonlat)[:500]
    idx = np.argmin(np.abs(locs_o[None, :, 0] - locs_c[:, 0:1]), axis=1)
    np.testing.assert_allclose(deq[sel], orig[idx], atol=0.02)


def test_pruned_retrieval_quantized_bank():
    """retrieve_pruned streams int8 banks natively (scale folded in-kernel)."""
    from range_tpu.bank.bank import GeoBank, quantize_values
    from range_tpu.bank.clustered import cluster_bank, tile_stats
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_pallas import retrieve_pruned

    bank = GeoBank.synthetic(9, 700, key_dim=16, value_dim=32, pad_to=256)
    clustered, stats = cluster_bank(quantize_values(bank), n_clusters=4,
                                    bn=128, seed=1)
    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    xyz = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    out = np.asarray(retrieve_pruned(q, xyz, clustered, stats, tier="exact",
                                     bm=8, bn=128, interpret=True))
    fc, _ = cluster_bank(bank, n_clusters=4, bn=128, seed=1)
    ref = np.asarray(retrieve(q, xyz, fc))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 0.05, rel.max()
