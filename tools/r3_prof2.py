import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Post-slim/lr stage profile of the FLAGSHIP serving config (bn512,
joint clustering, lr_rank=256, slim operands, asym K32/j3/kg4, bm=128):
where do the 8.45 ms actually go now?  Times each stage standalone
(overlap makes the sum exceed e2e — the ratios still rank the levers)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval_hier import (
    _hier_parts_family_call, _hier_scan_call, _hybrid_order, _pad_queries,
    hier_topk, retrieve_hier, select_tiles)
from range_tpu.ops.retrieval_pallas import pack_queries

B = 10_240
BM, TC, K, JS, KG = 256, 16, 32, 3, 16
SCAN_BM = 512


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, iters=10, **kw):
    f = functools.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (time.perf_counter() - s) / iters)
    return best * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               seed=0, chunk=4096, lr_rank=256,
                               k_tiles=K, j_sem=JS, k_geo=KG,
                               hier_cache="/tmp/r3t_lr256.npz")
    hb = enc.extra
    lap(f"bank ready t_real={hb.t_real} t_pad={hb.t_pad} lr={hb.lr_rank}")

    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    tow = jax.jit(lambda c: tower.apply(tp, c))
    ms_tow = t(tow, coords)
    q = tow(coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    lap(f"tower (jit): {ms_tow:.2f} ms")

    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    sem_vw = hb.g_sem_vw_lr if hb.g_sem_vw_lr is not None else hb.g_sem_vw

    ms_scan = t(_hier_scan_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                sem_vw, hb.g_geo_vw, bm=SCAN_BM, tc=TC, gpt_s=gpt_s,
                gpt_g=gpt_g)
    m_s, s_s, m_g, s_g, tails = _hier_scan_call(
        q_cat, hb.g_sem_cat, hb.g_geo_cat, sem_vw, hb.g_geo_vw,
        bm=SCAN_BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)
    lap(f"scan+lr-tail: {ms_scan:.2f} ms")

    @jax.jit
    def sort_stage(q_cat, m_s, s_s, m_g, s_g, tails):
        home = jnp.argmax(jnp.where(
            jnp.arange(hb.t_pad)[None, :] < hb.t_real, m_s, -jnp.inf), axis=1)
        order = _hybrid_order(q_x, home.astype(jnp.int32), B, hb.t_pad,
                              sort="geo")
        inv = jnp.argsort(order)
        return (q_cat[order], m_s[order], s_s[order], m_g[order],
                s_g[order], tails[order], inv)

    ms_sort = t(sort_stage, q_cat, m_s, s_s, m_g, s_g, tails)
    q_cat2, m_s2, s_s2, m_g2, s_g2, tails2, inv = sort_stage(
        q_cat, m_s, s_s, m_g, s_g, tails)
    lap(f"sort+permute: {ms_sort:.2f} ms")

    sel_s = jax.jit(functools.partial(
        select_tiles, t_real=hb.t_real, k_tiles=K, bm=BM, n_valid=B,
        j_sem=JS, j_geo=2, mode="range"))
    sel_g = jax.jit(functools.partial(
        select_tiles, t_real=hb.t_real, k_tiles=KG, bm=BM, n_valid=B,
        j_sem=2, j_geo=JS, mode="range"))
    ms_sel = t(lambda: (sel_s(m_s2, s_s2, m_g2, s_g2),
                        sel_g(m_g2, s_g2, m_s2, s_s2)))
    idx_s, _ = sel_s(m_s2, s_s2, m_g2, s_g2)
    idx_g, _ = sel_g(m_g2, s_g2, m_s2, s_s2)
    lap(f"select (sem K={K} + geo K={KG}): {ms_sel:.2f} ms")

    ms_ps = t(_hier_parts_family_call, q_cat2, hb.k_cat, hb.values,
              hb.value_scale, hb.mask_neg, idx_s, hb.g_sem_cat, sem_vw,
              sem_d=hb.sem_d, bm=BM, bn=hb.bn, gpt=gpt_s, geo=False,
              lr=hb.g_sem_vw_lr is not None)
    lap(f"parts sem (K={K}): {ms_ps:.2f} ms")
    ms_pg = t(_hier_parts_family_call, q_cat2, hb.k_cat, hb.values,
              hb.value_scale, hb.mask_neg, idx_g, hb.g_geo_cat, hb.g_geo_vw,
              sem_d=hb.sem_d, bm=BM, bn=hb.bn, gpt=gpt_g, geo=True, lr=False)
    lap(f"parts geo (K={KG}): {ms_pg:.2f} ms")

    ms_e2e = t(retrieve_hier, q, q_xyz, hb, scan_bm=SCAN_BM, k_tiles=K, bm=BM, tc=TC,
               j_sem=JS, k_geo=KG)
    tot = ms_scan + ms_sort + ms_sel + ms_ps + ms_pg
    lap(f"SUM {tot:.2f} ms vs retrieve_hier e2e {ms_e2e:.2f} ms "
        f"({B/ms_e2e*1000:,.0f} q/s) + tower {ms_tow:.2f}")

    ms_topk = t(hier_topk, q, q_xyz, hb, k_tiles=40, bm=BM)
    lap(f"hier_topk K=40: {ms_topk:.2f} ms ({B/ms_topk*1000:,.0f} q/s)")


if __name__ == "__main__":
    main()
