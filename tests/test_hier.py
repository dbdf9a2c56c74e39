"""Hierarchical retrieval (ops/retrieval_hier.py) vs the exact path.

The reference has no approximate retrieval (single-GPU brute force,
range/range.py:209-240); these tests pin the hier path's contract instead:
same output semantics as ops.retrieval.retrieve, fidelity degrading
gracefully with the knobs, exactness when every tile is selected, and the
serving recall harness (`hier_nn`) agreeing with exact NN.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import range_tpu
from range_tpu.bank.bank import GeoBank, quantize_values
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import (build_hier_bank, hier_nn,
                                          hier_topk, retrieve_hier)
from range_tpu.ops.topk import recall_at_k

N = 6000
PAD = 512
BN = 128


@pytest.fixture(scope="module")
def bank():
    return GeoBank.synthetic_informative(0, N, pad_to=PAD)


@pytest.fixture(scope="module")
def hb(bank):
    return build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                           value_dtype=jnp.float32)


def _make_queries(bank, regional: bool, B: int = 512, seed: int = 3):
    """Query batch from the bank's own tower.  `regional=True` draws the
    batch from 8 geographic clusters — the spatially-coherent serving regime
    hier is built for (large batches / regional sweeps); `regional=False` is
    a fully global scatter (worst case for shared per-query-tile selection)."""
    rng = np.random.default_rng(seed)
    if regional:
        centers = rng.integers(0, N, 8)
        qi = np.repeat(centers, B // 8)
        jitter = rng.normal(0, 3.0, (B, 2))
    else:
        qi = rng.integers(0, N, B)
        jitter = rng.normal(0, 0.5, (B, 2))
    q_locs = np.asarray(bank.locs_lonlat)[qi] + jitter
    q_locs[:, 0] = (q_locs[:, 0] + 180) % 360 - 180
    q_locs[:, 1] = np.clip(q_locs[:, 1], -89.9, 89.9)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)  # = bank tower
    q = tower.apply(tp, jnp.asarray(q_locs, jnp.float32))
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    return q, lonlat_deg_to_xyz(jnp.asarray(q_locs, jnp.float32))


@pytest.fixture(scope="module")
def queries(bank):
    return _make_queries(bank, regional=True)


def _relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b) / np.maximum(np.abs(b), 1e-1)


def test_hier_all_tiles_matches_exact(bank, hb, queries):
    """With every tile selected the kernel path IS the exact dense path."""
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    out = retrieve_hier(q, qx, hb, k_tiles=hb.n_tiles, bm=128,
                        interpret=True)
    assert _relerr(out, ref).max() < 5e-3


def test_hier_close_to_exact(bank, hb, queries):
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    out = retrieve_hier(q, qx, hb, k_tiles=24, bm=128, interpret=True)
    rel = _relerr(out, ref)
    assert rel.mean() < 0.05, rel.mean()


def test_hier_more_tiles_is_closer(bank, hb, queries):
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    errs = []
    for K in (8, hb.n_tiles):
        out = retrieve_hier(q, qx, hb, k_tiles=K, bm=128, interpret=True)
        errs.append(_relerr(out, ref).mean())
    assert errs[-1] < errs[0]


def test_hier_recall(hb, queries):
    """The serving path's reachable argmax vs HIGHEST-precision exact NN.

    The toy bank (6k rows, 47 tiles) is the hard regime for tile selection
    — fractions don't transfer from the 100k serving bank (bench.py is the
    real quality gate); here we pin a floor at moderate K and the 0.999 bar
    at generous K."""
    q, qx = queries
    true = exact_nn(q, hb.bank)
    nn = hier_nn(q, qx, hb, k_tiles=24, bm=128, j_sem=3)
    assert recall_at_k(np.asarray(nn)[:, None], true) >= 0.95
    nn = hier_nn(q, qx, hb, k_tiles=40, bm=128, j_sem=6)
    assert recall_at_k(np.asarray(nn)[:, None], true) >= 0.999


def test_hier_global_batch_degrades_gracefully(bank, hb):
    """Fully-global scattered batches (worst case for per-query-tile
    sharing) stay usable at moderate K."""
    q, qx = _make_queries(bank, regional=False)
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    out = retrieve_hier(q, qx, hb, k_tiles=32, bm=128, interpret=True)
    assert _relerr(out, ref).mean() < 0.10


def test_hier_range_mode(bank, hb, queries):
    """mode='range' (sem only, no locations): queries are grouped by home
    sem tile instead of geography; sem-only features are the hardest case
    (no geo blend dilutes the approximation)."""
    q, qx = queries
    ref = retrieve(q, None, bank, sem_temp=15.0, mode="range", chunk=PAD)
    out = retrieve_hier(q, None, hb, sem_temp=15.0, mode="range",
                        k_tiles=32, bm=128, interpret=True)
    assert _relerr(out, ref).mean() < 0.10


def test_hier_int8_values(bank, queries):
    """int8-quantized banks stream raw int8 through the hier kernel (scale
    folded into the probability tile) and match the f32 path closely."""
    q, qx = queries
    hb8 = build_hier_bank(quantize_values(bank), bn=BN, gsz_sem=8,
                          gsz_geo=16, tier="exact")
    assert hb8.value_scale is not None and hb8.values.dtype == jnp.int8
    hb32 = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact")
    out8 = retrieve_hier(q, qx, hb8, k_tiles=24, bm=128, interpret=True)
    out32 = retrieve_hier(q, qx, hb32, k_tiles=24, bm=128, interpret=True)
    assert _relerr(out8, out32).mean() < 0.01


def test_hier_through_api(bank):
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5,
                               retrieval="hier", hier_bn=BN, gsz_geo=16,
                               k_tiles=32, hier_bm=128, chunk=PAD, seed=0)
    rng = np.random.default_rng(5)
    coords = np.stack([rng.uniform(-180, 180, 256),
                       rng.uniform(-90, 90, 256)], 1)
    out = np.asarray(enc(coords))
    assert out.shape == (256, 1280)
    assert np.isfinite(out).all()
    # hier output agrees with the dense encoder on the same bank/tower
    dense = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5,
                                 chunk=PAD, seed=0)
    ref = np.asarray(dense(coords))
    rel = _relerr(out[:, :1024], ref[:, :1024])
    assert rel.mean() < 0.12, rel.mean()
    np.testing.assert_allclose(out[:, 1024:], ref[:, 1024:], atol=1e-5)


def test_hier_topk_recall(bank, hb):
    """hier_topk (big-K tile selection + hi/lo exact argmax over selected
    tiles) recovers the f32-exact semantic NN on nearly every query; with
    every tile selected it must match exactly (the hi/lo logit split is
    ~f32-accurate and ties are resolved first-index like argmax)."""
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import hier_topk

    q, q_xyz = _make_queries(bank, regional=False, B=256, seed=7)
    true = np.asarray(exact_nn(q, hb.bank, chunk=PAD))
    # all tiles selected -> selection cannot miss (fully-scattered batch)
    got_all = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=hb.t_real, bm=128,
                                   interpret=True))
    assert (got_all == true).mean() >= 0.995, (got_all != true).sum()
    # serving config (K < T) in the serving regime: spatially coherent
    # batches (128 scattered queries per 16-of-47-tile budget cannot work
    # by design — bench.py measures the real 100k-bank serving recall)
    qr, qr_xyz = _make_queries(bank, regional=True, B=256, seed=8)
    true_r = np.asarray(exact_nn(qr, hb.bank, chunk=PAD))
    got = np.asarray(hier_topk(qr, qr_xyz, hb, k_tiles=24, bm=128,
                               interpret=True))
    assert (got == true_r).mean() >= 0.95, (got != true_r).sum()
    # no q_xyz: home-tile sort path
    got2 = np.asarray(hier_topk(qr, None, hb, k_tiles=24, bm=128,
                                interpret=True))
    assert (got2 == true_r).mean() >= 0.92, (got2 != true_r).sum()


def test_hier_bank_save_load_roundtrip(bank, hb, tmp_path):
    """save_hier_bank/load_hier_bank round-trip: identical serving output
    (bf16 operands stored as bit patterns) — the serving-restart cache."""
    from range_tpu.ops.retrieval_hier import load_hier_bank, save_hier_bank

    path = str(tmp_path / "hier.npz")
    save_hier_bank(hb, path)
    hb2 = load_hier_bank(path)
    assert hb2.t_pad == hb.t_pad and hb2.tier == hb.tier
    q, qx = _make_queries(bank, regional=True, B=256, seed=12)
    a = np.asarray(retrieve_hier(q, qx, hb, k_tiles=16, bm=128,
                                 interpret=True))
    b = np.asarray(retrieve_hier(q, qx, hb2, k_tiles=16, bm=128,
                                 interpret=True))
    np.testing.assert_array_equal(a, b)
    # through the API: second load_model hits the cache
    path2 = str(tmp_path / "api_hier.npz")
    enc1 = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                hier_bn=BN, gsz_geo=16, chunk=PAD, seed=0,
                                hier_cache=path2)
    import os
    assert os.path.exists(path2)
    enc2 = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                hier_bn=BN, gsz_geo=16, chunk=PAD, seed=0,
                                hier_cache=path2)
    coords = np.stack([np.linspace(-170, 170, 2048),
                       np.linspace(-80, 80, 2048)], 1)
    np.testing.assert_array_equal(np.asarray(enc1(coords)),
                                  np.asarray(enc2(coords)))


def test_hier_hybrid_sort_mode(bank, hb, queries):
    """sort='hybrid' (coarse geo cell, then home sem tile) — the refactored
    branch runs a stats-only pre-scan; output must stay close to dense."""
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    out = retrieve_hier(q, qx, hb, k_tiles=24, bm=128, sort="hybrid",
                        interpret=True)
    assert _relerr(out, ref).mean() < 0.06


def test_hier_topk_k_matches_dense_topk(bank, hb):
    """k-carry kernel (k > 1): with every tile selected the top-k rows must
    equal the dense HIGHEST-precision top-k over the bank's semantic keys
    (order included — logits are continuous, ties vanish)."""
    from range_tpu.ops.retrieval_hier import hier_topk
    from range_tpu.ops.topk import topk_sem

    q, q_xyz = _make_queries(bank, regional=False, B=256, seed=9)
    k = 4
    _, true_k = topk_sem(q, hb.bank, k=k, chunk=PAD)
    got = np.asarray(hier_topk(q, q_xyz, hb, k=k, k_tiles=hb.t_real, bm=128,
                               interpret=True))
    assert got.shape == (256, k)
    # row-for-row (rank-sensitive) agreement
    agree = (got == np.asarray(true_k)).mean()
    assert agree >= 0.99, agree
    # serving config: selection budget < T, coherent batch
    qr, qr_xyz = _make_queries(bank, regional=True, B=256, seed=10)
    _, true_rk = topk_sem(qr, hb.bank, k=k, chunk=PAD)
    got_r = np.asarray(hier_topk(qr, qr_xyz, hb, k=k, k_tiles=24, bm=128,
                                 interpret=True))
    # recall@k: fraction of true top-k rows recovered anywhere in the list
    hits = np.mean([np.isin(t, g).mean() for t, g in
                    zip(np.asarray(true_rk), got_r)])
    assert hits >= 0.9, hits


@pytest.fixture(scope="module")
def hb2(bank):
    """Two-level bank: nested supergroups of 16 rows over fine groups of 8."""
    return build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, gsz_super=16,
                           tier="exact", value_dtype=jnp.float32)


def test_hier2_all_tiles_matches_exact(bank, hb2, queries):
    """Two-level telescope (coarse_tail + sum_M(fine-super) +
    sum_K(exact-fine)) with every tile in both M and K must equal the dense
    exact computation."""
    q, q_xyz = queries
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    out = np.asarray(retrieve_hier(q, q_xyz, hb2, k_tiles=hb2.t_real,
                                   m_tiles=hb2.t_real, bm=128,
                                   interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()


def test_hier2_partial_not_worse_than_v1(bank, hb, hb2, queries):
    """At equal exact-tile budget K the two-level path (with its coarse
    scan + M-tile fine refinement) must not lose fidelity vs the one-level
    path — the refinement replaces the coarse tail wherever it matters."""
    q, q_xyz = queries
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    out2 = np.asarray(retrieve_hier(q, q_xyz, hb2, k_tiles=8, m_tiles=16,
                                    bm=128, interpret=True))
    out1 = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=8, bm=128,
                                    interpret=True))
    rel2 = (np.abs(out2 - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    rel1 = (np.abs(out1 - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    assert rel2 < rel1 * 1.1, (rel2, rel1)


def test_hier2_topk(bank, hb2):
    """hier_topk on a two-level bank: coarse M-selection + fine refine
    stats + K<=M exact argmax.  All tiles -> exact; partial budget in the
    coherent regime stays high-recall; k>1 rides the same selection."""
    from range_tpu.ops.retrieval_hier import hier_topk
    from range_tpu.ops.topk import topk_sem

    q, q_xyz = _make_queries(bank, regional=False, B=256, seed=7)
    true = np.asarray(exact_nn(q, hb2.bank, chunk=PAD))
    got_all = np.asarray(hier_topk(q, q_xyz, hb2, k_tiles=hb2.t_real,
                                   m_tiles=hb2.t_real, bm=128,
                                   interpret=True))
    assert (got_all == true).mean() >= 0.995, (got_all != true).sum()
    qr, qr_xyz = _make_queries(bank, regional=True, B=256, seed=8)
    true_r = np.asarray(exact_nn(qr, hb2.bank, chunk=PAD))
    got = np.asarray(hier_topk(qr, qr_xyz, hb2, k_tiles=24, m_tiles=36,
                               bm=128, interpret=True))
    assert (got == true_r).mean() >= 0.95, (got != true_r).sum()
    k = 4
    _, true_k = topk_sem(qr, hb2.bank, k=k, chunk=PAD)
    got_k = np.asarray(hier_topk(qr, qr_xyz, hb2, k=k, k_tiles=24,
                                 m_tiles=36, bm=128, interpret=True))
    hits = np.mean([np.isin(t, g).mean() for t, g in
                    zip(np.asarray(true_k), got_k)])
    assert hits >= 0.9, hits


def test_hier2_save_load_roundtrip(bank, hb2, queries, tmp_path):
    """Supergroup operands + gsz_super meta survive the disk round-trip."""
    from range_tpu.ops.retrieval_hier import (load_hier_bank,
                                              save_hier_bank)

    path = str(tmp_path / "hb2.npz")
    save_hier_bank(hb2, path)
    hb2b = load_hier_bank(path)
    assert hb2b.gsz_super == hb2.gsz_super
    np.testing.assert_array_equal(np.asarray(hb2b.g_sup_cat),
                                  np.asarray(hb2.g_sup_cat))
    q, q_xyz = queries
    a = np.asarray(retrieve_hier(q, q_xyz, hb2, k_tiles=8, m_tiles=16,
                                 bm=128, interpret=True))
    b = np.asarray(retrieve_hier(q, q_xyz, hb2b, k_tiles=8, m_tiles=16,
                                 bm=128, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_hier_lr_tail(bank, queries):
    """Low-rank sem tail: at FULL rank (r = Dv) the lr pipeline must match
    the full-width pipeline exactly (the unprojection is lossless); at
    partial rank it stays close (the bank's group value sums are
    low-rank-ish); all-tiles remains exact regardless (the tail cancels)."""
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier

    q, q_xyz = queries
    Dv = bank.value_dim
    hb_full = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16,
                              tier="exact", value_dtype=jnp.float32)
    hb_lr = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                            value_dtype=jnp.float32, lr_rank=Dv)
    assert hb_lr.g_sem_vw_lr is not None and hb_lr.u_sem.shape == (Dv, Dv)
    a = np.asarray(retrieve_hier(q, q_xyz, hb_full, k_tiles=8, bm=128,
                                 interpret=True))
    b = np.asarray(retrieve_hier(q, q_xyz, hb_lr, k_tiles=8, bm=128,
                                 interpret=True))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)

    # partial rank: all-tiles exact (tail fully cancelled by parts)
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    hb_r = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                           value_dtype=jnp.float32, lr_rank=Dv // 2)
    out_all = np.asarray(retrieve_hier(q, q_xyz, hb_r, k_tiles=hb_r.t_real,
                                       bm=128, interpret=True))
    rel = np.abs(out_all - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()
    # partial rank + partial selection: close to full-width fidelity
    out_r = np.asarray(retrieve_hier(q, q_xyz, hb_r, k_tiles=8, bm=128,
                                     interpret=True))
    rel_r = (np.abs(out_r - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    rel_f = (np.abs(a - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    assert rel_r < rel_f + 0.05, (rel_r, rel_f)


def test_hier_lr_rank_clamped_to_value_dim(bank, queries):
    """lr_rank > Dv must clamp to Dv (the Gram eigenbasis has at most Dv
    vectors) and serve identically to an explicit full-rank build — the
    unclamped layout used to disagree with the stored lr_rank and crash
    the combine on small-Dv banks (round-3 flagship probe regression)."""
    from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier

    q, q_xyz = queries
    Dv = bank.value_dim
    hb_big = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16,
                             tier="exact", value_dtype=jnp.float32,
                             lr_rank=Dv + 200)
    assert hb_big.lr_rank == Dv and hb_big.u_sem.shape == (Dv, Dv)
    hb_full = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16,
                              tier="exact", value_dtype=jnp.float32,
                              lr_rank=Dv)
    a = np.asarray(retrieve_hier(q, q_xyz, hb_big, k_tiles=8, k_geo=4,
                                 bm=128, interpret=True))
    b = np.asarray(retrieve_hier(q, q_xyz, hb_full, k_tiles=8, k_geo=4,
                                 bm=128, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_hier_asymmetric_family_parts(bank, hb, queries):
    """k_geo > 0 splits the exact budgets per family (sem-only + geo-only
    parts kernels).  With every tile in both lists it must equal the dense
    exact computation; at serving budgets it must be at least as good as
    the symmetric path at equal TOTAL exact work (K_sym ~ K_sem/2 + ...)."""
    q, q_xyz = queries
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    out_all = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=hb.t_real,
                                       k_geo=hb.t_real, bm=128,
                                       interpret=True))
    rel = np.abs(out_all - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()

    # asymmetric K_sem=12/K_geo=4 vs symmetric K=8: equal-ish exact row
    # work ((12+4) single-family ~ 8 dual-family), better sem coverage
    out_asym = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=12, k_geo=4,
                                        bm=128, interpret=True))
    out_sym = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=8, bm=128,
                                       interpret=True))
    rel_a = (np.abs(out_asym - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    rel_s = (np.abs(out_sym - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    assert rel_a < rel_s * 1.15, (rel_a, rel_s)


def test_hier_asymmetric_with_lr(bank, queries):
    """Asymmetric parts compose with the low-rank sem tail: full rank +
    all tiles stays exact."""
    from range_tpu.ops.retrieval_hier import build_hier_bank

    q, q_xyz = queries
    hb_lr = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                            value_dtype=jnp.float32,
                            lr_rank=bank.value_dim // 2)
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    out = np.asarray(retrieve_hier(q, q_xyz, hb_lr, k_tiles=hb_lr.t_real,
                                   k_geo=hb_lr.t_real, bm=128,
                                   interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()
    out_p = np.asarray(retrieve_hier(q, q_xyz, hb_lr, k_tiles=12, k_geo=4,
                                     bm=128, interpret=True))
    rel_p = (np.abs(out_p - ref) / np.maximum(np.abs(ref), 1e-1)).mean()
    assert rel_p < 0.2, rel_p


def test_hier_res_rank_full_matches_plain(bank, queries):
    """Residual-rank parts (mean + global rank-k residual basis replacing
    the [bn, Dv] value matmul): at k = Dv the basis is complete, so the
    family-split pipeline must match the plain family kernels; composes
    with the low-rank sem tail.  (At partial rank the parts correction is
    itself approximate — the all-tiles==exact invariant intentionally
    holds only at full rank.)"""
    from range_tpu.ops.retrieval_hier import build_hier_bank

    q, q_xyz = queries
    Dv = bank.value_dim
    kw = dict(bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
              value_dtype=jnp.float32)
    hb0 = build_hier_bank(bank, **kw)
    hbF = build_hier_bank(bank, res_rank=Dv, **kw)
    assert hbF.res_rank == Dv and hbF.z_sem is not None
    assert hbF.w_sem.shape[1] == Dv and hbF.z_geo.shape[0] == hbF.k_cat.shape[0]
    a = np.asarray(retrieve_hier(q, q_xyz, hb0, k_tiles=12, k_geo=4, bm=128,
                                 interpret=True))
    b = np.asarray(retrieve_hier(q, q_xyz, hbF, k_tiles=12, k_geo=4, bm=128,
                                 interpret=True))
    assert _relerr(b, a).max() < 2e-2

    hbL = build_hier_bank(bank, res_rank=Dv, lr_rank=Dv, **kw)
    d = np.asarray(retrieve_hier(q, q_xyz, hbL, k_tiles=12, k_geo=4, bm=128,
                                 interpret=True))
    assert _relerr(d, a).max() < 2e-2


def test_hier_res_rank_partial_stays_close(bank, queries):
    """Partial-rank residuals degrade gracefully: mean relerr vs dense
    within a modest factor of the plain family path at equal budgets, and
    res banks auto-route to the family-split kernels when k_geo=0."""
    from range_tpu.ops.retrieval_hier import build_hier_bank

    q, q_xyz = queries
    Dv = bank.value_dim
    kw = dict(bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
              value_dtype=jnp.float32)
    hb0 = build_hier_bank(bank, **kw)
    hbH = build_hier_bank(bank, res_rank=Dv // 2, **kw)
    ref = np.asarray(retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    a = np.asarray(retrieve_hier(q, q_xyz, hb0, k_tiles=12, k_geo=4, bm=128,
                                 interpret=True))
    c = np.asarray(retrieve_hier(q, q_xyz, hbH, k_tiles=12, k_geo=4, bm=128,
                                 interpret=True))
    rel_a, rel_c = _relerr(a, ref).mean(), _relerr(c, ref).mean()
    assert rel_c < rel_a * 2 + 0.05, (rel_c, rel_a)
    # k_geo=0 on a res bank must auto-split families (not the joint path)
    e = np.asarray(retrieve_hier(q, q_xyz, hbH, k_tiles=12, bm=128,
                                 interpret=True))
    assert np.isfinite(e).all()


def test_hier_res_rank_roundtrip(tmp_path, bank):
    """save/load preserves the residual operands and res_rank meta."""
    from range_tpu.ops.retrieval_hier import (build_hier_bank,
                                              load_hier_bank,
                                              save_hier_bank)

    hb = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                         value_dtype=jnp.float32, res_rank=32)
    p = str(tmp_path / "res.npz")
    save_hier_bank(hb, p)
    hb2 = load_hier_bank(p)
    assert hb2.res_rank == 32
    np.testing.assert_array_equal(np.asarray(hb.z_sem), np.asarray(hb2.z_sem))
    np.testing.assert_array_equal(np.asarray(hb.w_geo), np.asarray(hb2.w_geo))


def test_hier_topk_fine_stats_operand(tmp_path, bank, queries):
    """topk_gsz: a FINER stats-only centroid operand for the top-k
    selection signal (the feature tail can then run coarse without
    costing topk recall).  With every tile selected the argmax equals the
    no-operand path exactly (selection saturated); at partial K the fine
    signal must not do worse; save/load round-trips the operand."""
    from range_tpu.ops.retrieval_hier import (build_hier_bank, hier_topk,
                                              load_hier_bank,
                                              save_hier_bank)

    q, q_xyz = queries
    hb16 = build_hier_bank(bank, bn=BN, gsz_sem=16, gsz_geo=16,
                           tier="exact", value_dtype=jnp.float32)
    hbf = build_hier_bank(bank, bn=BN, gsz_sem=16, gsz_geo=16,
                          tier="exact", value_dtype=jnp.float32, topk_gsz=8)
    assert hbf.g_topk_cat is not None and hbf.topk_gsz == 8
    assert hbf.g_topk_cat.shape[0] == hbf.t_pad * (BN // 8)
    a = np.asarray(hier_topk(q, q_xyz, hb16, k_tiles=hb16.t_real, bm=128,
                             interpret=True))
    b = np.asarray(hier_topk(q, q_xyz, hbf, k_tiles=hbf.t_real, bm=128,
                             interpret=True))
    np.testing.assert_array_equal(a, b)

    true = np.asarray(exact_nn(q, hbf.bank, chunk=PAD))
    rec_f = float((np.asarray(hier_topk(q, q_xyz, hbf, k_tiles=8, bm=128,
                                        interpret=True)) == true).mean())
    rec_c = float((np.asarray(hier_topk(q, q_xyz, hb16, k_tiles=8, bm=128,
                                        interpret=True)) == true).mean())
    assert rec_f >= rec_c - 0.01, (rec_f, rec_c)

    p = str(tmp_path / "tk.npz")
    save_hier_bank(hbf, p)
    hb2 = load_hier_bank(p)
    assert hb2.topk_gsz == 8
    np.testing.assert_array_equal(np.asarray(hbf.g_topk_cat),
                                  np.asarray(hb2.g_topk_cat))


def test_build_rejects_gsz_super_with_topk_gsz():
    """gsz_super and topk_gsz both feed hier_topk's selection stage and the
    branch order would silently ignore the fine topk operand — the build
    must refuse the combination (advisor r3 #3)."""
    bank = GeoBank.synthetic_device(0, 1024, key_dim=32, value_dim=16,
                                    pad_to=256)
    with pytest.raises(AssertionError, match="mutually exclusive"):
        build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16,
                        gsz_super=16, topk_gsz=8)


def test_hosted_build_matches_device():
    """The host-staged build (`host_stage=True` — auto above 500k rows,
    VERDICT r3 #5) must produce the same serving bank as the device build.
    With `group_by='key'` the clustering features are identical f32 in both
    paths, so the row order matches exactly and every operand must agree to
    fp noise; serving outputs must match tightly."""
    bank = GeoBank.synthetic_informative(3, 6000, value_dim=64, pad_to=512)
    kw = dict(bn=128, gsz_sem=8, gsz_geo=16, group_by="key", lr_rank=32,
              res_rank=16, topk_gsz=8, seed=0)
    hb_d = build_hier_bank(bank, host_stage=False, **kw)
    hb_h = build_hier_bank(bank, host_stage=True, **kw)

    assert (hb_h.t_pad, hb_h.t_real, hb_h.sem_d, hb_h.cat_d) == \
        (hb_d.t_pad, hb_d.t_real, hb_d.sem_d, hb_d.cat_d)
    # identical row order -> rowwise operands agree exactly (mod dtype)
    np.testing.assert_array_equal(np.asarray(hb_h.bank.valid_mask),
                                  np.asarray(hb_d.bank.valid_mask))
    np.testing.assert_allclose(np.asarray(hb_h.bank.keys_sem),
                               np.asarray(hb_d.bank.keys_sem), atol=0)
    np.testing.assert_allclose(
        np.asarray(hb_h.k_cat, np.float32),
        np.asarray(hb_d.k_cat, np.float32), atol=0)
    np.testing.assert_allclose(
        np.asarray(hb_h.khl_sem, np.float32),
        np.asarray(hb_d.khl_sem, np.float32), atol=0)
    # group sums: same per-group reduction, chunk boundaries never split a
    # group -> tight
    np.testing.assert_allclose(
        np.asarray(hb_h.g_sem_vw, np.float32),
        np.asarray(hb_d.g_sem_vw, np.float32), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hb_h.g_geo_vw, np.float32),
        np.asarray(hb_d.g_geo_vw, np.float32), rtol=1e-5, atol=1e-5)
    # serving outputs (the contract): feature path + topk identical-ish
    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=9)
    out_d = np.asarray(retrieve_hier(q, q_xyz, hb_d, k_tiles=8, bm=128,
                                     tc=4, interpret=True))
    out_h = np.asarray(retrieve_hier(q, q_xyz, hb_h, k_tiles=8, bm=128,
                                     tc=4, interpret=True))
    rel = np.abs(out_h - out_d) / np.maximum(np.abs(out_d), 1e-1)
    assert rel.max() < 5e-3, rel.max()
    tk_d = np.asarray(hier_topk(q, q_xyz, hb_d, k_tiles=8, bm=128, tc=4,
                                interpret=True))
    tk_h = np.asarray(hier_topk(q, q_xyz, hb_h, k_tiles=8, bm=128, tc=4,
                                interpret=True))
    assert (tk_d == tk_h).mean() > 0.99, (tk_d != tk_h).sum()


def test_hosted_build_serves_key_value(tmp_path):
    """group_by='key_value' (the build default): the hosted path's bf16
    clustering features may order rows differently from the small-bank f32
    device path, so parity is behavioral — both builds approximate the
    dense reference equally well — and the hosted bank round-trips through
    the save/load cache."""
    bank = GeoBank.synthetic_informative(4, 6000, value_dim=64, pad_to=512)
    kw = dict(bn=128, gsz_sem=8, gsz_geo=16, lr_rank=32, res_rank=16)
    hb_d = build_hier_bank(bank, host_stage=False, **kw)
    hb_h = build_hier_bank(bank, host_stage=True, **kw)
    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=10)

    def relerr(hb):
        ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=512))
        out = np.asarray(retrieve_hier(q, q_xyz, hb, k_tiles=8, bm=128,
                                       tc=4, interpret=True))
        return (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)).mean()

    r_d, r_h = relerr(hb_d), relerr(hb_h)
    assert r_h < max(2 * r_d, 0.08), (r_h, r_d)

    # cache round-trip: hosted banks persist/load like device-built ones
    from range_tpu.ops.retrieval_hier import load_hier_bank, save_hier_bank
    p = str(tmp_path / "hosted.npz")
    save_hier_bank(hb_h, p)
    hb2 = load_hier_bank(p)
    out_a = np.asarray(retrieve_hier(q, q_xyz, hb_h, k_tiles=8, bm=128,
                                     tc=4, interpret=True))
    out_b = np.asarray(retrieve_hier(q, q_xyz, hb2, k_tiles=8, bm=128,
                                     tc=4, interpret=True))
    np.testing.assert_allclose(out_a, out_b, rtol=2e-2, atol=2e-3)


def test_fused_combine_concat_matches_xla():
    """retrieve_hier(concat_query=q) on the flagship shape (lr+rr family
    split, 128-aligned widths) routes through the fused combine+concat
    Pallas kernel; the output must equal concatenate([retrieve_hier(...),
    q]) from the XLA combine to fp noise — and non-fusable shapes must
    honor the same concat contract via the fallback."""
    bank = GeoBank.synthetic_informative(5, 6000, value_dim=128, pad_to=512)
    hb2 = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16,
                          lr_rank=128, res_rank=64, seed=0)
    assert hb2.lr_rank == 128 and hb2.z_sem is not None
    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=13)
    kw = dict(k_tiles=8, k_geo=4, bm=128, tc=4, j_sem=2, interpret=True)
    ref = np.asarray(retrieve_hier(q, q_xyz, hb2, **kw))
    fused = np.asarray(retrieve_hier(q, q_xyz, hb2, concat_query=q, **kw))
    assert fused.shape == (256, 128 + q.shape[1])
    np.testing.assert_allclose(fused[:, :128], ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fused[:, 128:], np.asarray(q), atol=0)

    # fallback contract: a bank without rr (no fused path) concatenates too
    hb3 = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, seed=0)
    ref3 = np.asarray(retrieve_hier(q, q_xyz, hb3, k_tiles=8, bm=128, tc=4,
                                    interpret=True))
    out3 = np.asarray(retrieve_hier(q, q_xyz, hb3, k_tiles=8, bm=128, tc=4,
                                    concat_query=q, interpret=True))
    np.testing.assert_allclose(out3[:, :128], ref3, atol=0)
    np.testing.assert_allclose(out3[:, 128:], np.asarray(q), atol=0)


def test_geo_lr_tail():
    """build_hier_bank(lr_geo=r): low-rank geo tail (round 4).  At full
    rank (r >= Dv) the factorization is complete, so outputs must match the
    full-width build to fp noise; truncated rank stays close (the sharply-
    local geo family's tail mass is small); the fused combine+concat kernel
    must agree with the XLA combine on geo-lr banks."""
    bank = GeoBank.synthetic_informative(6, 6000, value_dim=128, pad_to=512)
    kw = dict(bn=128, gsz_sem=8, gsz_geo=16, lr_rank=128, res_rank=64,
              seed=0)
    hb_full = build_hier_bank(bank, **kw)
    hb_lrg = build_hier_bank(bank, lr_geo=128, **kw)     # complete basis
    assert hb_lrg.g_geo_vw_lr is not None and hb_lrg.lr_geo == 128
    q, q_xyz = _make_queries(bank, regional=True, B=256, seed=14)
    skw = dict(k_tiles=8, k_geo=4, bm=128, tc=4, interpret=True)
    ref = np.asarray(retrieve_hier(q, q_xyz, hb_full, **skw))
    out = np.asarray(retrieve_hier(q, q_xyz, hb_lrg, **skw))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-2 and rel.mean() < 5e-3, (rel.max(), rel.mean())

    # truncated rank: still close to the full-width build
    hb_t = build_hier_bank(bank, lr_geo=64, **kw)
    out_t = np.asarray(retrieve_hier(q, q_xyz, hb_t, **skw))
    rel_t = np.abs(out_t - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel_t.mean() < 0.05, rel_t.mean()

    # fused combine+concat parity on the geo-lr shape
    fused = np.asarray(retrieve_hier(q, q_xyz, hb_lrg, concat_query=q,
                                     **skw))
    np.testing.assert_allclose(fused[:, :128], out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fused[:, 128:], np.asarray(q), atol=0)

    # save/load round-trip carries the geo-lr operands
    import tempfile, os
    from range_tpu.ops.retrieval_hier import load_hier_bank, save_hier_bank
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.npz")
        save_hier_bank(hb_lrg, p)
        hb2 = load_hier_bank(p)
        assert hb2.lr_geo == 128 and hb2.g_geo_vw_lr is not None
        out2 = np.asarray(retrieve_hier(q, q_xyz, hb2, **skw))
        np.testing.assert_allclose(out2, out, rtol=2e-2, atol=2e-3)


def test_adaptive_rescue_caps_error_tail():
    """adaptive_frac > 0 (round 4): the worst-coverage queries re-run the
    parts kernels with a wider selection.  Un-rescued rows must stay
    bit-identical to the adaptive_frac=0 output; rescued rows must move
    toward the exact dense reference (p99/max error shrinks, never grows),
    and the fused combine path must agree with the XLA combine."""
    from range_tpu.ops.retrieval import retrieve as retrieve_dense

    bank = GeoBank.synthetic_informative(7, 8000, value_dim=256, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, lr_rank=128,
                         res_rank=128, seed=0)
    q, q_xyz = _make_queries(bank, regional=False, B=512, seed=21)
    skw = dict(k_tiles=4, k_geo=2, bm=128, tc=4, j_sem=2, interpret=True)
    base = np.asarray(retrieve_hier(q, q_xyz, hb, **skw))
    resc = np.asarray(retrieve_hier(q, q_xyz, hb, adaptive_frac=0.25,
                                    adaptive_mult=4, **skw))
    ref = np.asarray(retrieve_dense(q, q_xyz, bank, sem_temp=12.0,
                                    geo_temp=40.0, beta=0.5, chunk=512))
    den = np.maximum(np.abs(ref), 1e-1)
    e_base = (np.abs(base - ref) / den).max(axis=1)   # per-query max relerr
    e_resc = (np.abs(resc - ref) / den).max(axis=1)

    changed = np.any(base != resc, axis=1)
    assert changed.any(), "rescue substituted no rows"
    # un-rescued rows bit-identical (substitution is surgical)
    np.testing.assert_array_equal(base[~changed], resc[~changed])
    # rescued rows moved toward exact: tail shrinks, never grows
    assert e_resc[changed].mean() < e_base[changed].mean()
    assert np.percentile(e_resc, 99) <= np.percentile(e_base, 99) * 1.001
    assert e_resc.max() <= e_base.max() * 1.001

    # fused combine+concat path sees the same rescued partials
    fused = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q,
                                     adaptive_frac=0.25, adaptive_mult=4,
                                     **skw))
    np.testing.assert_allclose(fused[:, :256], resc, rtol=1e-5, atol=1e-5)


def test_tail_super_telescope():
    """tail_super (round 4): the scan's supergroup sem tail + the fine-tail
    correction on the selected K+m_corr tiles must telescope back to the
    fine-tail pipeline.  With the correction covering EVERY tile the output
    matches the baseline (up to the bf16 split of the tail operand); with
    partial cover the error vs the exact dense reference decreases
    monotonically in m_corr; and the fused combine sees the same tails."""
    from range_tpu.ops.retrieval import retrieve as retrieve_dense

    bank = GeoBank.synthetic_informative(7, 8000, value_dim=256, pad_to=512)
    bkw = dict(bn=128, gsz_sem=8, gsz_geo=16, lr_rank=128, res_rank=128,
               seed=0)
    hb0 = build_hier_bank(bank, **bkw)
    hb = build_hier_bank(bank, tail_super=32, **bkw)
    assert hb.tail_super == 32 and hb.g_sem_ts_vw is not None
    # ts operands: supergroup means + zero-count-column corrections
    ratio = 32 // 8
    src = np.asarray(hb.g_sem_vw_lr, np.float32)
    tsv = np.asarray(hb.g_sem_ts_vw, np.float32)
    np.testing.assert_allclose(
        tsv, src.reshape(-1, ratio, src.shape[1]).mean(1), rtol=2e-2,
        atol=2e-3)
    dvw = np.asarray(hb.g_sem_ts_dvw, np.float32)
    cnt_col = 128  # lr_rank column layout: [coef(128) | cnt | pad]
    np.testing.assert_allclose(dvw[:, cnt_col], 0.0, atol=1e-6)

    q, q_xyz = _make_queries(bank, regional=False, B=512, seed=23)
    skw = dict(k_tiles=4, k_geo=2, bm=128, tc=4, j_sem=2, interpret=True)
    base = np.asarray(retrieve_hier(q, q_xyz, hb0, **skw))
    # full correction cover == the fine-tail baseline (telescope identity;
    # tolerance = the bf16 ts_vw/dvw split of the bf16 tail operand)
    full = np.asarray(retrieve_hier(q, q_xyz, hb, m_corr=hb.t_real, **skw))
    np.testing.assert_allclose(full, base, rtol=2e-2, atol=2e-3)

    ref = np.asarray(retrieve_dense(q, q_xyz, bank, sem_temp=12.0,
                                    geo_temp=40.0, beta=0.5, chunk=512))
    den = np.maximum(np.abs(ref), 1e-1)

    def err(m_corr):
        out = np.asarray(retrieve_hier(q, q_xyz, hb, m_corr=m_corr, **skw))
        return np.abs(out - ref) / den

    e0, e8, efull = err(0), err(8), np.abs(full - ref) / den
    # more corrected tiles -> monotonically tighter tail approximation
    assert e8.mean() <= e0.mean() + 1e-9
    assert efull.mean() <= e8.mean() + 1e-9
    # K exact tiles stay telescopically consistent even at m_corr=0: the
    # m_corr=0 error must stay in the same regime as the fine baseline's
    eb = np.abs(base - ref) / den
    assert e0.mean() < 3 * eb.mean() + 1e-3

    # fused combine+concat path sees the corrected tails identically
    fused = np.asarray(retrieve_hier(q, q_xyz, hb, m_corr=8, concat_query=q,
                                     **skw))
    plain = np.asarray(retrieve_hier(q, q_xyz, hb, m_corr=8, **skw))
    np.testing.assert_allclose(fused[:, :256], plain, rtol=1e-5, atol=1e-5)

    # composition with the adaptive rescue (both substitute per-query rows)
    resc = np.asarray(retrieve_hier(q, q_xyz, hb, m_corr=8,
                                    adaptive_frac=0.25, adaptive_mult=3,
                                    **skw))
    er = np.abs(resc - ref) / den
    assert np.percentile(er, 99) <= np.percentile(e8, 99) * 1.001

    # family-split only (res_rank banks auto-assign k_geo, so exercise the
    # gate on a plain tail_super bank where nothing forces the split)
    hb_plain = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16,
                               tail_super=32, seed=0)
    with pytest.raises(ValueError, match="family-split"):
        retrieve_hier(q, q_xyz, hb_plain, k_tiles=4, bm=128, tc=4,
                      interpret=True)


def test_tail_super_save_load(tmp_path):
    bank = GeoBank.synthetic_informative(7, 8000, value_dim=256, pad_to=512)
    hb = build_hier_bank(bank, bn=128, gsz_sem=8, gsz_geo=16, lr_rank=128,
                         res_rank=128, tail_super=32, seed=0)
    from range_tpu.ops.retrieval_hier import (hier_build_signature,
                                              load_hier_bank, save_hier_bank)

    sig = hier_build_signature(bank, bn=128, gsz_sem=8, gsz_geo=16,
                               tier="fast", seed=0, shards=1, lr_rank=128,
                               res_rank=128, tail_super=32)
    assert sig["tail_super"] == 32
    p = str(tmp_path / "ts.npz")
    save_hier_bank(hb, p, build=sig)
    hb2 = load_hier_bank(p)
    assert hb2.tail_super == 32
    np.testing.assert_array_equal(np.asarray(hb2.g_sem_ts_vw, np.float32),
                                  np.asarray(hb.g_sem_ts_vw, np.float32))
    q, q_xyz = _make_queries(bank, regional=False, B=256, seed=5)
    skw = dict(k_tiles=4, k_geo=2, bm=128, tc=4, m_corr=4, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(retrieve_hier(q, q_xyz, hb2, **skw)),
        np.asarray(retrieve_hier(q, q_xyz, hb, **skw)))


# ---------------------------------------------------------------------------
# round 5: query-block tile-list dedup (merged parts dispatches)


def test_dedup_union_unit():
    """_dedup_union invariants: rank-major priority, dedup, repeat-padding,
    and per-block top-rank survival under truncation."""
    from range_tpu.ops.retrieval_hier import _dedup_union

    idx = jnp.asarray([[0, 1, 2, 3], [2, 3, 4, 5],
                       [10, 11, 12, 13], [12, 1, 0, 9]], jnp.int32)
    u = np.asarray(_dedup_union(idx, 2, 8))
    # superblock 0: union {0..5}, 6 distinct; pad repeats the last entry
    assert set(u[0][:6].tolist()) == {0, 1, 2, 3, 4, 5}
    assert u[0][6] == u[0][5] and u[0][7] == u[0][5]
    # rank-major: both blocks' rank-0 tiles lead
    assert u[0][0] == 0 and u[0][1] == 2
    assert set(u[1][:7].tolist()) == {10, 11, 12, 13, 1, 0, 9}
    assert u[1][7] == u[1][6]
    # truncation to 4 keeps each block's two highest ranks
    t = np.asarray(_dedup_union(idx, 2, 4))
    assert t[0].tolist() == [0, 2, 1, 3]
    assert t[1].tolist() == [10, 12, 11, 1]
    # every emitted row stays within the input id set (no pad sentinel)
    assert set(np.unique(u)).issubset(set(np.unique(np.asarray(idx))))


def test_hier_dedup_not_worse(bank, hb, queries):
    """dedup merges adjacent blocks' tile lists into one dispatch: with an
    untruncated union every query sees a SUPERSET of its own block's exact
    tiles, so feature error must not degrade (it usually improves)."""
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    kw = dict(k_tiles=12, k_geo=6, bm=128, interpret=True)
    base = _relerr(retrieve_hier(q, qx, hb, **kw), ref).mean()
    ded = _relerr(retrieve_hier(q, qx, hb, dedup=2, k_union=24, **kw),
                  ref).mean()
    assert ded <= base * 1.02 + 1e-6, (ded, base)


def test_hier_dedup_all_tiles_exact(bank, hb, queries):
    """Exactness survives dedup (incl. the kernel's repeat-padding skip):
    all tiles selected -> the union is all tiles + pad repeats -> exact."""
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    out = retrieve_hier(q, qx, hb, k_tiles=hb.n_tiles, k_geo=hb.n_tiles,
                        bm=128, dedup=2, interpret=True)
    assert _relerr(out, ref).max() < 5e-3


def test_hier_dedup_with_lr_rr(bank, queries):
    """dedup on the flagship kernel shape (family-split + lr + res_rank):
    close to the non-dedup result and not worse vs exact."""
    Dv = bank.value_dim
    hbf = build_hier_bank(bank, bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
                          value_dtype=jnp.float32, lr_rank=Dv, res_rank=Dv)
    q, qx = queries
    ref = retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0, beta=0.5,
                   chunk=PAD)
    kw = dict(k_tiles=12, k_geo=6, bm=128, interpret=True)
    base = _relerr(retrieve_hier(q, qx, hbf, **kw), ref).mean()
    ded = _relerr(retrieve_hier(q, qx, hbf, dedup=2, k_union=24, **kw),
                  ref).mean()
    assert ded <= base * 1.02 + 1e-6, (ded, base)


# ---------------------------------------------------------------------------
# round 5: mesh-distributed bank build (VERDICT r4 #7)


def test_mesh_build_matches_hosted():
    """build_hier_bank_mesh (SPMD over the 8-way virtual mesh) produces the
    same serving operands as the host-staged single-device build: identical
    row layout (shared host ordering code), fp-class-equal packed/group
    operands, and — at complete rank, where eigenbasis sign/rotation
    ambiguity cancels in reconstruction — equal lr/res factors' action.
    The built bank serves EXACTLY (all tiles selected == dense) through
    sharded_retrieve_hier."""
    import jax
    from jax.sharding import Mesh

    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import (_build_hier_bank_hosted,
                                              build_hier_bank_mesh)
    from range_tpu.parallel.sharded import sharded_retrieve_hier

    bank = GeoBank.synthetic_informative(0, 20000, pad_to=512, value_dim=64)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("bank",))
    kw = dict(bn=128, gsz_sem=8, gsz_geo=16, lr_rank=64, lr_geo=64,
              res_rank=64, topk_gsz=8, sel_lr=256, seed=0)
    hbm = build_hier_bank_mesh(bank, mesh, tier="exact",
                               value_dtype=jnp.float32, **kw)
    hbh = _build_hier_bank_hosted(bank, gsz_super=0, tier="exact",
                                  group_by="key_value",
                                  group_value_weight=1.0, tail_super=0,
                                  n_clusters=None, iters=8,
                                  value_dtype=jnp.float32, shards=8, **kw)
    assert (hbm.t_real, hbm.t_pad) == (hbh.t_real, hbh.t_pad)
    # row layout identical -> packed row operands bit-comparable
    np.testing.assert_array_equal(np.asarray(hbm.k_cat),
                                  np.asarray(hbh.k_cat))
    np.testing.assert_array_equal(np.asarray(hbm.khl_sem),
                                  np.asarray(hbh.khl_sem))
    np.testing.assert_array_equal(np.asarray(hbm.mask_neg),
                                  np.asarray(hbh.mask_neg))
    # group centroids / value sums: same math, different partition order
    for a, b in ((hbm.g_sem_cat, hbh.g_sem_cat),
                 (hbm.g_geo_cat, hbh.g_geo_cat),
                 (hbm.g_topk_cat, hbh.g_topk_cat)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)
    for a, b in ((hbm.g_sem_vw, hbh.g_sem_vw),
                 (hbm.g_geo_vw, hbh.g_geo_vw)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-3)
    # complete-rank factors: reconstruction (coef @ u, z @ w) is invariant
    # to the eigh's basis ambiguity
    Dv = 64
    rec_m = np.asarray(hbm.g_sem_vw_lr, np.float32)[:, :Dv] @ np.asarray(hbm.u_sem)
    rec_h = np.asarray(hbh.g_sem_vw_lr, np.float32)[:, :Dv] @ np.asarray(hbh.u_sem)
    np.testing.assert_allclose(rec_m, rec_h, rtol=1e-3, atol=2e-2)
    zr_m = np.asarray(hbm.z_sem, np.float32)[:, :Dv] @ np.asarray(hbm.w_sem)[:Dv]
    zr_h = np.asarray(hbh.z_sem, np.float32)[:, :Dv] @ np.asarray(hbh.w_sem)[:Dv]
    np.testing.assert_allclose(zr_m, zr_h, rtol=1e-3, atol=2e-2)
    # sel_lr sketch at complete rank: reconstruction invariant to basis
    assert hbm.sel_lr == hbh.sel_lr == 256 and hbm.p_sel is not None
    sel_m = np.asarray(hbm.g_sem_sel, np.float32) @ np.asarray(hbm.p_sel)
    sel_h = np.asarray(hbh.g_sem_sel, np.float32) @ np.asarray(hbh.p_sel)
    np.testing.assert_allclose(sel_m, sel_h, rtol=1e-4, atol=1e-4)

    # serve: all local tiles selected == exact dense
    rng = np.random.default_rng(4)
    B = 256
    locs = np.stack([rng.uniform(-180, 180, B),
                     rng.uniform(-80, 80, B)], 1).astype(np.float32)
    q = rng.standard_normal((B, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs))
    ref = np.asarray(retrieve(q, q_xyz, hbm.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=512))
    t_local = hbm.t_pad // 8
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, hbm, mesh, k_tiles=t_local, k_geo=t_local,
        tc=min(8, t_local), bm=128, interpret=True))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    assert rel.max() < 5e-3, rel.max()


def test_topk_lr_selection(bank, hb):
    """Low-rank selection operand (round 5): at COMPLETE rank the projected
    stats logits equal the full ones (PCA basis spans the centroids), so
    hier_topk's result matches the full-operand bank's exactly; at partial
    rank recall vs exact NN stays in the full operand's class.  Survives a
    save/load roundtrip."""
    import tempfile

    from range_tpu.ops.retrieval_hier import (load_hier_bank,
                                              save_hier_bank)

    q, qx = _make_queries(bank, regional=True, B=512, seed=9)
    hb_tk = build_hier_bank(bank, bn=BN, gsz_sem=16, gsz_geo=16,
                            tier="exact", value_dtype=jnp.float32,
                            topk_gsz=8)
    hb_full = build_hier_bank(bank, bn=BN, gsz_sem=16, gsz_geo=16,
                              tier="exact", value_dtype=jnp.float32,
                              topk_gsz=8, topk_lr=256)  # complete rank
    assert hb_full.g_topk_lr is not None and hb_full.topk_lr == 256
    got_f = np.asarray(hier_topk(q, qx, hb_tk, k_tiles=12, interpret=True))
    got_c = np.asarray(hier_topk(q, qx, hb_full, k_tiles=12, interpret=True))
    assert (got_f == got_c).mean() > 0.995, (got_f != got_c).sum()

    hb_lr = build_hier_bank(bank, bn=BN, gsz_sem=16, gsz_geo=16,
                            tier="exact", value_dtype=jnp.float32,
                            topk_gsz=8, topk_lr=64)
    true = np.asarray(exact_nn(q, bank, chunk=PAD))
    rec_full = (np.asarray(hier_topk(q, qx, hb_tk, k_tiles=12,
                                     interpret=True)) == true).mean()
    rec_lr = (np.asarray(hier_topk(q, qx, hb_lr, k_tiles=12,
                                   interpret=True)) == true).mean()
    assert rec_lr >= rec_full - 0.02, (rec_lr, rec_full)

    with tempfile.TemporaryDirectory() as d:
        save_hier_bank(hb_lr, d + "/hb.npz")
        hb2 = load_hier_bank(d + "/hb.npz")
        assert hb2.topk_lr == 64 and hb2.p_topk is not None
        got2 = np.asarray(hier_topk(q, qx, hb2, k_tiles=12, interpret=True))
        got1 = np.asarray(hier_topk(q, qx, hb_lr, k_tiles=12,
                                    interpret=True))
        np.testing.assert_array_equal(got1, got2)


def test_sel_lr_feature_path(bank, hb, queries):
    """Feature-path selection+tail sketch (round 5, sel_lr): at COMPLETE
    rank the sketched group logits equal the full ones (the PCA basis spans
    the centroids), so retrieve_hier matches the full-operand bank; at
    partial rank the output error vs the exact dense path stays in the full
    operand's class (only unselected-tail mass + selection ranking see the
    sketch).  Family-split only; survives save/load."""
    import tempfile

    from range_tpu.ops.retrieval_hier import (load_hier_bank,
                                              save_hier_bank)

    q, qx = queries
    kw = dict(bn=BN, gsz_sem=8, gsz_geo=16, tier="exact",
              value_dtype=jnp.float32)
    hb_c = build_hier_bank(bank, sel_lr=256, **kw)  # complete rank
    assert hb_c.g_sem_sel is not None and hb_c.sel_lr == 256
    serve = dict(k_tiles=16, k_geo=8, bm=128, interpret=True)
    out_f = np.asarray(retrieve_hier(q, qx, hb, **serve))
    out_c = np.asarray(retrieve_hier(q, qx, hb_c, **serve))
    assert _relerr(out_c, out_f).max() < 5e-3

    ref = np.asarray(retrieve(q, qx, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=PAD))
    hb_64 = build_hier_bank(bank, sel_lr=64, **kw)
    out_64 = np.asarray(retrieve_hier(q, qx, hb_64, **serve))
    e_full = _relerr(out_f, ref).mean()
    e_64 = _relerr(out_64, ref).mean()
    assert e_64 <= e_full + 0.02, (e_64, e_full)

    # sel_lr banks serve via the family-split path only
    with pytest.raises(ValueError, match="family-split"):
        retrieve_hier(q, qx, hb_64, k_tiles=16, bm=128, interpret=True)
    # tail_super is mutually exclusive at build time
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_hier_bank(bank, sel_lr=64, tail_super=32, **kw)

    with tempfile.TemporaryDirectory() as d:
        save_hier_bank(hb_64, d + "/hb.npz")
        hb2 = load_hier_bank(d + "/hb.npz")
        assert hb2.sel_lr == 64 and hb2.p_sel is not None
        out2 = np.asarray(retrieve_hier(q, qx, hb2, **serve))
        np.testing.assert_array_equal(out_64, out2)
