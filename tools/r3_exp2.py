import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-3 experiment battery #2 (real TPU, one process):

A. stage breakdown of the hier pipeline at the serving config — scan
   (fused stats+tail), stats-only scan, selection, parts, argmax, sort
   permutes, plus tower and e2e — what dominates the 10.85 ms;
D. coarse-tail quality: end-feature relerr when the sem tail runs at
   supergroup granularity (gsz 16/32/64) instead of 8 — computed in plain
   XLA on a query subset against the f32-exact dense features, for BOTH
   (i) window-aggregation of the current gsz-8 ordering and (ii) a
   nested two-level ordering — is a coarse tail fidelity-free?
E. coarse-stats selection coverage: P(true argmax row's tile in the
   per-query top-j tiles) when tile stats come from supergroup logits
   instead of fine-group logits — can hier_topk ride a cheaper scan?
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import (build_hier_bank, hier_topk,
                                          retrieve_hier, select_tiles,
                                          _hier_scan_call,
                                          _hier_scan_stats_call,
                                          _hier_argmax_call, _hier_parts_call,
                                          _hybrid_order, _pad_queries)
from range_tpu.ops.retrieval_pallas import _split_hilo, pack_queries

BANK_N = 100_000
B = 10_240
BM, TC = 256, 16


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, 'dtype')][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, iters=10, **kw):
    f = functools.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    T0 = time.time()
    hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast",
                         seed=0)
    print(f"build_hier_bank: {time.time()-T0:.0f}s  t_real={hb.t_real} "
          f"t_pad={hb.t_pad}", flush=True)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    Dk = hb.bank.key_dim

    # ---- A: stage breakdown at serving config ----
    ms = t(lambda c: tower.apply(tp, c), coords)
    print(f"A tower: {ms:.2f} ms", flush=True)
    q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    Bp = q_cat.shape[0]

    ms = t(_hier_scan_call, q_cat, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw,
           hb.g_geo_vw, bm=BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)
    print(f"A fused scan (stats+tail): {ms:.2f} ms", flush=True)
    ms = t(_hier_scan_stats_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
           bm=BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)
    print(f"A stats-only scan: {ms:.2f} ms", flush=True)

    m_s, s_s, m_g, s_g, tails = _hier_scan_call(
        q_cat, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw, hb.g_geo_vw,
        bm=BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)

    sel_j = jax.jit(functools.partial(
        select_tiles, t_real=hb.t_real, k_tiles=16, bm=BM, n_valid=B,
        j_sem=2, j_geo=2, mode="range+"))
    ms = t(sel_j, m_s, s_s, m_g, s_g)
    print(f"A select_tiles K=16: {ms:.2f} ms", flush=True)
    idx, _ = sel_j(m_s, s_s, m_g, s_g)
    ms = t(_hier_parts_call, q_cat, hb.k_cat, hb.values, hb.value_scale,
           hb.mask_neg, idx, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw,
           hb.g_geo_vw, sem_d=hb.sem_d, bm=BM, bn=hb.bn, gpt_s=gpt_s,
           gpt_g=gpt_g)
    print(f"A parts K=16: {ms:.2f} ms", flush=True)

    sel56 = jax.jit(functools.partial(
        select_tiles, t_real=hb.t_real, k_tiles=56, bm=BM, n_valid=B,
        j_sem=6, j_geo=2, mode="range"))
    idx56, _ = sel56(m_s, s_s, m_g, s_g)
    qh, ql = _split_hilo(q_s)
    q2 = jnp.concatenate([qh, qh], axis=1)
    ms = t(_hier_argmax_call, q2, ql, hb.khl_sem, hb.mask_neg, idx56,
           Dk=Dk, bm=BM, bn=hb.bn)
    print(f"A argmax K=56: {ms:.2f} ms", flush=True)

    @jax.jit
    def sort_cost(q_cat, q_x):
        order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                              hb.t_pad, sort="geo")
        inv = jnp.argsort(order)
        return q_cat[order], inv

    ms = t(sort_cost, q_cat, q_x)
    print(f"A geo sort+permute q_cat: {ms:.2f} ms", flush=True)

    ms = t(retrieve_hier, q, q_xyz, hb)
    print(f"A retrieve_hier e2e: {ms:.2f} ms", flush=True)
    ms = t(hier_topk, q, q_xyz, hb)
    print(f"A hier_topk e2e: {ms:.2f} ms", flush=True)

    # ---- D: coarse-tail quality (plain XLA, 2048-query subset) ----
    # exact f32 dense reference on the subset
    qs, qs_xyz = q[:2048], q_xyz[:2048]
    ref = retrieve(qs, qs_xyz, hb.bank, sem_temp=12.0, geo_temp=40.0,
                   beta=0.5, chunk=4096)
    N = hb.k_cat.shape[0]
    keys = hb.bank.keys_sem.astype(jnp.float32)
    vals = (hb.bank.values.astype(jnp.float32)
            * hb.bank.row_mask()[:, None])
    mask = hb.bank.row_mask()
    xyz = hb.bank.xyz.astype(jnp.float32)

    def group_ops_np(feats, gsz, m=None):
        G = N // gsz
        mg = (mask if m is None else m).reshape(G, gsz)
        cnt = mg.sum(axis=1)
        w = mg / jnp.maximum(cnt, 1.0)[:, None]
        cg = jnp.einsum("gi,gid->gd", w, feats.reshape(G, gsz, -1))
        vs = jnp.einsum("gi,gid->gd", mg, vals.reshape(G, gsz, -1))
        return cg, vs, cnt

    # true fine-group selection at serving config: top-K tiles per query
    # tile (reuse idx from A), then approximate features per scheme
    def hier_like(qsub, qsub_xyz, gsz, order_perm=None):
        """sem family only (the diffuse one): exact rows for the selected
        tiles (per-query-tile idx) + gsz-group tail elsewhere."""
        k = keys if order_perm is None else keys[order_perm]
        v = vals if order_perm is None else vals[order_perm]
        m = mask if order_perm is None else mask[order_perm]
        cg, vs, cnt = group_ops_np(k, gsz, m)
        ql_ = 12.0 * (qsub @ k.T)  # [b, N] sem logits (f32)
        lg = 12.0 * (qsub @ cg.T)  # [b, G]
        b = qsub.shape[0]
        # selected rows: top-K tiles by per-query max fine logit union —
        # approximate with per-QUERY top-K tiles (upper bound on serving)
        tl = ql_.reshape(b, -1, hb.bn).max(axis=2)  # [b, T]
        _, top_t = jax.lax.top_k(tl, 16)
        keep_t = jnp.zeros((b, N // hb.bn)).at[
            jnp.arange(b)[:, None], top_t].set(1.0)
        keep_r = jnp.repeat(keep_t, hb.bn, axis=1)  # [b, N]
        keep_g = jnp.repeat(keep_t, hb.bn // gsz, axis=1)  # [b, G]
        e_r = jnp.exp(ql_ + (m - 1.0)[None, :] * 1e30)
        e_g = jnp.exp(lg)
        num = (e_r * keep_r) @ v + ((e_g * (1 - keep_g)) * cnt[None, :] /
                                    jnp.maximum(cnt, 1)[None, :]) @ vs
        den = ((e_r * keep_r).sum(1) + ((e_g * (1 - keep_g)) * cnt[None, :]
                                        / jnp.maximum(cnt, 1)[None, :]
                                        ).sum(1))
        return num / den[:, None]

    # exact sem reference (beta=1 sem only)
    sem_ref = retrieve(qs, None, hb.bank, sem_temp=12.0, geo_temp=40.0,
                       beta=1.0, mode="range", chunk=4096)
    f = jax.jit(hier_like, static_argnames=("gsz",))
    for gsz in (8, 16, 32, 64):
        out = f(qs[:1024], qs_xyz[:1024], gsz)
        rel = jnp.abs(out - sem_ref[:1024]) / jnp.maximum(
            jnp.abs(sem_ref[:1024]), 1e-1)
        print(f"D sem tail gsz={gsz} (current ordering): relerr mean "
              f"{float(rel.mean()):.4f} p99 "
              f"{float(jnp.percentile(rel, 99)):.4f}", flush=True)

    # (ii) nested ordering: re-cluster rows within tiles with a 2-level
    # k-means (8 superclusters of 64, fine 8s nested) — build-side change
    from range_tpu.ops.kmeans import kmeans
    ks2 = keys.reshape(-1, hb.bn, Dk)
    vs2 = mask.reshape(-1, hb.bn)
    Tt = ks2.shape[0]
    keys2 = jax.random.split(jax.random.PRNGKey(7), Tt)
    _, sup = jax.vmap(lambda kk, pp, vv: kmeans(
        kk, pp, 8, iters=6, valid=vv, init_points=pp[::hb.bn // 8])
    )(keys2, ks2, vs2)
    sup = np.asarray(sup)
    vn = np.asarray(vs2)
    sort_key = sup + (1.0 - vn) * 9
    order2 = np.argsort(sort_key, axis=1, kind="stable")
    perm2 = (order2 + (np.arange(Tt) * hb.bn)[:, None]).reshape(-1)
    out = f(qs[:1024], qs_xyz[:1024], 64, jnp.asarray(perm2))
    rel = jnp.abs(out - sem_ref[:1024]) / jnp.maximum(
        jnp.abs(sem_ref[:1024]), 1e-1)
    print(f"D sem tail gsz=64 (fresh 8-means/64 ordering): relerr mean "
          f"{float(rel.mean()):.4f} p99 "
          f"{float(jnp.percentile(rel, 99)):.4f}", flush=True)

    # ---- E: coarse-stats tile selection coverage ----
    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
    true_tile = true // hb.bn
    qp = q_cat[:, :hb.sem_d]

    for gsz, tag in ((8, "fine"), (64, "win64"), (64, "nested64")):
        if tag == "nested64":
            p2 = jnp.asarray(perm2)
            cg, _, _ = group_ops_np(keys[p2], gsz, mask[p2])
        else:
            cg, _, _ = group_ops_np(keys, gsz)
        cgp = jnp.pad(12.0 * np.log2(np.e) * cg,
                      ((0, 0), (0, hb.sem_d - Dk)))

        @jax.jit
        def tile_max(qc, cgp=cgp, gsz=gsz):
            gl = jnp.dot(qc, cgp.T, preferred_element_type=jnp.float32)
            return gl.reshape(qc.shape[0], -1, hb.bn // gsz).max(axis=2)

        hits = {}
        for lo in range(0, B, 2048):
            tm = tile_max(qp[lo:lo + 2048])
            tt = true_tile[lo:lo + 2048]
            for j in (2, 4, 6, 8, 12):
                _, top_t = jax.lax.top_k(tm, j)
                got = (np.asarray(top_t) == tt[:, None]).any(1)
                hits.setdefault(j, []).append(got)
        line = " ".join(f"j={j}:{np.concatenate(v).mean():.4f}"
                        for j, v in sorted(hits.items()))
        print(f"E tile-coverage {tag} (gsz={gsz}): {line}", flush=True)


if __name__ == "__main__":
    main()
