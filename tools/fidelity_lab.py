import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""CPU fidelity lab: probe-parity mechanism search without the TPU tunnel.

Reproduces tools/probe_parity.py's informative checkerboard bank at reduced
scale and emulates the hier pipeline's FIDELITY semantics exactly — the real
`select_tiles` (union-over-bm + rank weights + mass fill), the real geo query
sort, and the same exact-rows + group-tail telescope — but in pure XLA
matmuls (no Pallas), so one mechanism variant runs in seconds on CPU.

Variants probed (VERDICT r2 #2 — close the 0.957-vs-0.926 gap at serving
cost):
  dense          exact reference
  v1 K=...       one-level: fine-group tail + K exact tiles (serving today)
  perq K=...     per-QUERY top-K tiles (no union) — upper bound on selection
  jointcl        groups clustered on [key | value] instead of key only —
                 purer group value sums (less class mixing in the tail)
  bn256          finer tiles at equal exact-row budget
"""
import functools
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu  # noqa: E402
from range_tpu.data.checkerboard import assign_closest_label, fibonacci_lattice  # noqa: E402
from range_tpu.eval.probe import evaluate_arrays  # noqa: E402
from range_tpu.geometry import lonlat_deg_to_xyz  # noqa: E402
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder  # noqa: E402
from range_tpu.ops.retrieval_hier import select_tiles, _hybrid_order  # noqa: E402
from range_tpu.ops.kmeans import kmeans  # noqa: E402

BANK_N = 24_576
N_SUPPORT, N_CLASSES = 100, 16
BN = 256          # rows per tile (serving: 512 at 100k rows; scaled down)
GSZ = 8
BM = 128
SEM_T, GEO_T, BETA = 12.0, 40.0, 0.5

rng = np.random.default_rng(3)
s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)


def sample_points(n, seed):
    r = np.random.default_rng(seed)
    lons = r.uniform(-180, 180, n)
    lats = np.degrees(np.arcsin(r.uniform(-1, 1, n)))
    labs = assign_closest_label(lons, lats, s_lon, s_lat, s_lab)
    return np.stack([lons, lats], 1).astype(np.float32), labs


bank_locs, bank_labs = sample_points(BANK_N, 11)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
k = tower.apply(tp, jnp.asarray(bank_locs))
k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
k = k + 0.25 * jax.random.normal(jax.random.PRNGKey(5), k.shape)
keys0 = np.asarray(k / jnp.linalg.norm(k, axis=1, keepdims=True))
values0 = (np.eye(N_CLASSES, dtype=np.float32)[bank_labs]
           + 0.3 * rng.standard_normal((BANK_N, N_CLASSES)).astype(np.float32))
lap("bank raw built")

# geographic tile clustering (same spirit as bank/clustered.py): k-means on
# xyz with a fibonacci seed, then rows sorted by tile
bank_xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(bank_locs)))
T = BANK_N // BN
fl_lon, fl_lat, _ = fibonacci_lattice(T, 2)
seeds = np.asarray(lonlat_deg_to_xyz(jnp.asarray(
    np.stack([fl_lon, fl_lat], 1), jnp.float32)))
_, tile_of = kmeans(jax.random.PRNGKey(1), jnp.asarray(bank_xyz), T, iters=8,
                    init_points=jnp.asarray(seeds))
tile_of = np.asarray(tile_of)
# balance to exactly BN rows per tile: sort by (tile, arbitrary), rows beyond
# BN spill to the next tile (good enough for a fidelity lab)
order0 = np.argsort(tile_of, kind="stable")
lap("geo clustering done")


def within_tile_order(keys, feats_for_grouping):
    """Rows (already tile-ordered) re-sorted within each BN-tile by k-means
    on `feats_for_grouping` so GSZ windows are coherent groups."""
    Tt = keys.shape[0] // BN
    f = jnp.asarray(feats_for_grouping).reshape(Tt, BN, -1)
    ks = jax.random.split(jax.random.PRNGKey(7), Tt)
    _, a = jax.vmap(lambda kk, pp: kmeans(kk, pp, BN // GSZ, iters=6,
                                          init_points=pp[::GSZ]))(ks, f)
    a = np.asarray(a)
    order = np.argsort(a, axis=1, kind="stable")
    return (order + (np.arange(Tt) * BN)[:, None]).reshape(-1)


def build(group_feats="key"):
    keys = keys0[order0]
    vals = values0[order0]
    locs = bank_locs[order0]
    if group_feats == "key":
        gf = keys
    else:  # key+value: joint clustering for purer group value sums
        lam = float(group_feats.split(":")[1]) if ":" in group_feats else 1.0
        vn = vals / (np.linalg.norm(vals, axis=1, keepdims=True) + 1e-9)
        gf = np.concatenate([keys, lam * vn], 1)
    perm = within_tile_order(keys, gf)
    return jnp.asarray(keys[perm]), jnp.asarray(vals[perm]), locs[perm]


train_pts, train_y = sample_points(8192, 21)
eval_pts, eval_y = sample_points(4096, 22)


def queries(pts):
    q = tower.apply(tp, jnp.asarray(pts))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return q.astype(jnp.float32), lonlat_deg_to_xyz(jnp.asarray(pts))


@functools.partial(jax.jit, static_argnames=())
def dense_feats(q, qx, keys, vals, xyz):
    ls = SEM_T * (q @ keys.T)
    lg = GEO_T * (qx @ xyz.T)
    ps = jax.nn.softmax(ls, axis=1)
    pg = jax.nn.softmax(lg, axis=1)
    return BETA * (ps @ vals) + (1 - BETA) * (pg @ vals)


def hier_feats(q, qx, keys, vals, xyz, *, K, j_sem=2, j_geo=2,
               per_query=False, sort="geo", gsz=None):
    """Emulated serving features: geo-sorted bm blocks, real select_tiles
    union (or idealized per-query top-K), exact rows on selected tiles +
    fine-group tail elsewhere, both families."""
    B = q.shape[0]
    Bp = (B + BM - 1) // BM * BM
    q = jnp.pad(q, ((0, Bp - B), (0, 0)))
    qx = jnp.pad(qx, ((0, Bp - B), (0, 0)))
    gsz = gsz or GSZ
    G = keys.shape[0] // gsz
    kg0 = keys.reshape(G, gsz, -1).mean(axis=1)
    if sort == "geo":
        order = _hybrid_order(qx, jnp.zeros(Bp, jnp.int32), B, T, sort="geo")
    else:
        # home-tile signal from the (cheap) group-logit pre-pass — serving
        # computes this from the stats scan (sort='hybrid' path)
        lsg = SEM_T * (q @ kg0.T)
        home = jnp.argmax(lsg.reshape(Bp, T, BN // gsz).max(axis=2), axis=1)
        if sort == "home":
            key_ = jnp.where(jnp.arange(Bp) < B, home,
                             jnp.iinfo(jnp.int32).max)
            order = jnp.argsort(key_, stable=True)
        else:  # hybrid: coarse geo cell then home tile
            order = _hybrid_order(qx, home, B, T, sort="hybrid")
    inv = jnp.argsort(order)
    q, qx = q[order], qx[order]

    kg = kg0
    vg = vals.reshape(G, gsz, -1).sum(axis=1)
    xg = xyz.reshape(G // (BN // gsz) * (BN // gsz), gsz, -1)  # noqa
    xgm = xyz.reshape(G, gsz, -1).mean(axis=1)
    cnt = jnp.full((G,), float(gsz))

    @jax.jit
    def block(qb, qxb):
        ls_g = SEM_T * (qb @ kg.T)          # [bm, G] fine-group sem logits
        lg_g = GEO_T * (qxb @ xgm.T)
        m_s = ls_g.reshape(-1, T, BN // gsz).max(axis=2)
        s_s = jnp.exp(ls_g - ls_g.max(axis=1, keepdims=True)
                      ).reshape(-1, T, BN // gsz).sum(axis=2)
        m_g = lg_g.reshape(-1, T, BN // gsz).max(axis=2)
        s_g = jnp.exp(lg_g - lg_g.max(axis=1, keepdims=True)
                      ).reshape(-1, T, BN // gsz).sum(axis=2)
        if K == 0:
            keep_t = jnp.zeros((qb.shape[0], T))
        elif per_query:
            big = 1e9

            def perq(m, s, j):
                w = jnp.zeros_like(m)
                rem = m
                for _ in range(j):
                    thr = jnp.max(rem, axis=1, keepdims=True)
                    w = w + (m >= thr).astype(jnp.float32)
                    rem = jnp.where(rem >= thr, -jnp.inf, rem)
                return w

            sel_w = perq(m_s, s_s, j_sem) * big + s_s / s_s.sum(
                axis=1, keepdims=True)
            sel_w += perq(m_g, s_g, j_geo) * big + s_g / s_g.sum(
                axis=1, keepdims=True)
            _, idx = jax.lax.top_k(sel_w, K)          # [bm, K] per query
            keep_t = jnp.zeros((qb.shape[0], T)).at[
                jnp.arange(qb.shape[0])[:, None], idx].set(1.0)
        elif True:
            idx, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=T, k_tiles=K,
                                    bm=qb.shape[0], n_valid=qb.shape[0],
                                    j_sem=j_sem, j_geo=j_geo, mode="range+")
            keep_t = jnp.broadcast_to(sel[0], (qb.shape[0], T))
        keep_r = jnp.repeat(keep_t, BN, axis=1)       # [bm, N]
        keep_g = jnp.repeat(keep_t, BN // gsz, axis=1)  # [bm, G]
        ls = SEM_T * (qb @ keys.T)
        lg = GEO_T * (qxb @ xyz.T)

        # group tail contributes e_g * count_g to the denominator
        def fam2(l_row, l_grp):
            m = l_row.max(axis=1, keepdims=True)
            e_r = jnp.exp(l_row - m) * keep_r
            e_g = jnp.exp(l_grp - m) * (1 - keep_g)
            num = e_r @ vals + e_g @ vg
            den = e_r.sum(1) + (e_g * cnt[None, :]).sum(1)
            return num / den[:, None]

        sem = fam2(ls, SEM_T * (qb @ kg.T))
        geo = fam2(lg, GEO_T * (qxb @ xgm.T))
        return BETA * sem + (1 - BETA) * geo

    outs = []
    for lo in range(0, Bp, BM):
        outs.append(block(q[lo:lo + BM], qx[lo:lo + BM]))
    out = jnp.concatenate(outs, 0)
    return np.asarray(out[inv[:B]])


def two_level_feats(q, qx, keys, vals, xyz, *, M, K, gsz_f=4, gsz_sup=64,
                    gsz_geo=64, j_sem=2, j_geo=2):
    """Serving-shaped two-level emulation: coarse supergroup sem tail
    everywhere, fine gsz_f sem tail on the union-M tiles (coarse-stat
    selection), exact rows on union-K (fine-stat selection, K <= M); geo
    family at gsz_geo tail + exact on the K tiles.  All selection via the
    REAL select_tiles on block-shared stats."""
    B = q.shape[0]
    Bp = (B + BM - 1) // BM * BM
    q = jnp.pad(q, ((0, Bp - B), (0, 0)))
    qx = jnp.pad(qx, ((0, Bp - B), (0, 0)))
    order = _hybrid_order(qx, jnp.zeros(Bp, jnp.int32), B, T, sort="geo")
    inv = jnp.argsort(order)
    q, qx = q[order], qx[order]

    def grp(x, g, red):
        return getattr(x.reshape(x.shape[0] // g, g, -1), red)(axis=1)

    kgf = grp(keys, gsz_f, "mean"); vgf = grp(vals, gsz_f, "sum")
    kgs = grp(keys, gsz_sup, "mean"); vgs = grp(vals, gsz_sup, "sum")
    xgg = grp(xyz, gsz_geo, "mean"); vgg = grp(vals, gsz_geo, "sum")

    @jax.jit
    def block(qb, qxb):
        bsz = qb.shape[0]
        l_sup = SEM_T * (qb @ kgs.T)                    # [bm, Gsup]
        l_geo_g = GEO_T * (qxb @ xgg.T)                 # [bm, Ggeo]
        gps, gpg = BN // gsz_sup, BN // gsz_geo
        m_s = l_sup.reshape(bsz, T, gps).max(axis=2)
        s_s = jnp.exp(l_sup - l_sup.max(1, keepdims=True)).reshape(
            bsz, T, gps).sum(axis=2)
        m_g = l_geo_g.reshape(bsz, T, gpg).max(axis=2)
        s_g = jnp.exp(l_geo_g - l_geo_g.max(1, keepdims=True)).reshape(
            bsz, T, gpg).sum(axis=2)
        _, selM = select_tiles(m_s, s_s, m_g, s_g, t_real=T, k_tiles=M,
                               bm=bsz, n_valid=bsz, j_sem=j_sem,
                               j_geo=j_geo, mode="range+")
        keepM = jnp.broadcast_to(selM[0], (bsz, T))
        l_f = SEM_T * (qb @ kgf.T)                      # [bm, Gf]
        gpf = BN // gsz_f
        m_f = jnp.where(keepM > 0,
                        l_f.reshape(bsz, T, gpf).max(axis=2), -jnp.inf)
        s_f = jnp.where(keepM > 0, jnp.exp(
            l_f - l_f.max(1, keepdims=True)).reshape(
                bsz, T, gpf).sum(axis=2), 0.0)
        _, selK = select_tiles(m_f, s_f, m_g, s_g, t_real=T, k_tiles=K,
                               bm=bsz, n_valid=bsz, j_sem=j_sem,
                               j_geo=j_geo, mode="range+")
        keepK = jnp.broadcast_to(selK[0], (bsz, T)) * keepM  # K subset of M

        ls = SEM_T * (qb @ keys.T)
        lg = GEO_T * (qxb @ xyz.T)
        mref = ls.max(axis=1, keepdims=True)
        kR = jnp.repeat(keepK, BN, axis=1)
        kMf = jnp.repeat(keepM * (1 - keepK), BN // gsz_f, axis=1)
        kSc = jnp.repeat(1 - keepM, BN // gsz_sup, axis=1)
        e_r = jnp.exp(ls - mref) * kR
        e_f = jnp.exp(SEM_T * (qb @ kgf.T) - mref) * kMf
        e_s = jnp.exp(SEM_T * (qb @ kgs.T) - mref) * kSc
        num = e_r @ vals + e_f @ vgf + e_s @ vgs
        den = (e_r.sum(1) + gsz_f * e_f.sum(1) / gsz_f * gsz_f
               + e_s.sum(1) * gsz_sup)
        den = e_r.sum(1) + e_f.sum(1) * gsz_f + e_s.sum(1) * gsz_sup
        sem = num / den[:, None]
        mg_ = lg.max(axis=1, keepdims=True)
        kRg = jnp.repeat(keepK, BN, axis=1)
        kGc = jnp.repeat(1 - keepK, BN // gsz_geo, axis=1)
        e_rg = jnp.exp(lg - mg_) * kRg
        e_gg = jnp.exp(GEO_T * (qxb @ xgg.T) - mg_) * kGc
        geo = (e_rg @ vals + e_gg @ vgg) / (
            e_rg.sum(1) + e_gg.sum(1) * gsz_geo)[:, None]
        return BETA * sem + (1 - BETA) * geo

    outs = []
    for lo in range(0, Bp, BM):
        outs.append(block(q[lo:lo + BM], qx[lo:lo + BM]))
    return np.asarray(jnp.concatenate(outs, 0)[inv[:B]])


def probe(tr_feats, ev_feats):
    return evaluate_arrays(np.asarray(tr_feats), train_y,
                           np.asarray(ev_feats), eval_y, "checker_100")


def main():
    qt, qxt = queries(train_pts)
    qe, qxe = queries(eval_pts)

    keys, vals, locs = build("key")
    xyz = jnp.asarray(lonlat_deg_to_xyz(jnp.asarray(locs)))
    dtr = dense_feats(qt, qxt, keys, vals, xyz)
    dev = dense_feats(qe, qxe, keys, vals, xyz)
    acc_dense = probe(dtr, dev)
    lap(f"dense: {acc_dense:.4f}")

    def run(tag, keys, vals, xyz, **kw):
        tr = hier_feats(qt, qxt, keys, vals, xyz, **kw)
        ev = hier_feats(qe, qxe, keys, vals, xyz, **kw)
        rel = np.abs(ev - np.asarray(dev)) / np.maximum(np.abs(np.asarray(dev)), 1e-1)
        acc = probe(tr, ev)
        lap(f"{tag}: probe {acc:.4f} (gap {acc-acc_dense:+.4f}) "
            f"relerr {rel.mean():.4f}")
        return acc

    for K in (8, 16, 24, 32):
        run(f"v1 K={K}", keys, vals, xyz, K=K)
    run("v1 K=16 j=3", keys, vals, xyz, K=16, j_sem=3)
    for K in (8, 16):
        run(f"perq K={K}", keys, vals, xyz, K=K, per_query=True)

    for lam in (0.5, 1.0, 2.0):
        keys2, vals2, locs2 = build(f"kv:{lam}")
        xyz2 = jnp.asarray(lonlat_deg_to_xyz(jnp.asarray(locs2)))
        for K in (8, 16):
            run(f"jointcl(l={lam}) K={K}", keys2, vals2, xyz2, K=K)
        run(f"jointcl(l={lam}) perq K=16", keys2, vals2, xyz2, K=16,
            per_query=True)
    keys2, vals2, locs2 = build("kv:1.0")
    xyz2 = jnp.asarray(lonlat_deg_to_xyz(jnp.asarray(locs2)))
    for K in (24, 32):
        run(f"jointcl K={K}", keys2, vals2, xyz2, K=K)
    for srt in ("hybrid", "home"):
        for K in (8, 16, 24):
            run(f"jointcl K={K} sort={srt}", keys2, vals2, xyz2, K=K,
                sort=srt)
    def run2(tag, keys, vals, xyz, **kw):
        tr = two_level_feats(qt, qxt, keys, vals, xyz, **kw)
        ev = two_level_feats(qe, qxe, keys, vals, xyz, **kw)
        rel = np.abs(ev - np.asarray(dev)) / np.maximum(
            np.abs(np.asarray(dev)), 1e-1)
        acc = probe(tr, ev)
        lap(f"{tag}: probe {acc:.4f} (gap {acc-acc_dense:+.4f}) "
            f"relerr {rel.mean():.4f}")

    for M, gf in ((16, 4), (32, 4), (48, 4), (32, 2), (32, 8)):
        run2(f"2lvl jointcl M={M} K=8 gf={gf}", keys2, vals2, xyz2,
             M=M, K=8, gsz_f=gf)
    run2("2lvl plain M=32 K=8 gf=4", keys, vals, xyz, M=32, K=8, gsz_f=4)


if __name__ == "__main__":
    main()
