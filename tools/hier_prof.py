import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Component-level timing of the hier v2 pipeline on the real TPU."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval_hier import (build_hier_bank, retrieve_hier,
                                          _hier_scan_call, _hier_parts_call,
                                          _hybrid_order,
                                          select_tiles, _pad_queries)
from range_tpu.ops.retrieval_pallas import pack_queries

BANK_N = 100_000
B = 10_240
BM, TC, K, JS, JG = 256, 8, 16, 2, 2


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf[:1, :1].astype(jnp.float32)))


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


def main(tier="fast"):
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
    hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier=tier, seed=0)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo

    q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)

    ms_scan = t(_hier_scan_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                hb.g_sem_vw, hb.g_geo_vw, bm=BM, tc=TC, gpt_s=gpt_s,
                gpt_g=gpt_g)
    m_s, s_s, m_g, s_g, tails = _hier_scan_call(
        q_cat, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw, hb.g_geo_vw,
        bm=BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)

    @jax.jit
    def sort_stage(q_cat, m_s, s_s, m_g, s_g, tails):
        home = jnp.zeros(m_s.shape[0], jnp.int32)
        order = _hybrid_order(q_x, home, B, hb.t_pad, sort="geo")
        inv = jnp.argsort(order)
        return (q_cat[order], m_s[order], s_s[order], m_g[order], s_g[order],
                tails[order], inv)

    ms_sort = t(sort_stage, q_cat, m_s, s_s, m_g, s_g, tails)
    q_cat2, m_s2, s_s2, m_g2, s_g2, tails2, inv = sort_stage(
        q_cat, m_s, s_s, m_g, s_g, tails)

    sel_fn = jax.jit(functools.partial(
        select_tiles, t_real=hb.t_real, k_tiles=K, bm=BM, n_valid=B,
        j_sem=JS, j_geo=JG))
    ms_sel = t(sel_fn, m_s2, s_s2, m_g2, s_g2)
    idx, sel = sel_fn(m_s2, s_s2, m_g2, s_g2)

    ms_parts = t(_hier_parts_call, q_cat2, hb.k_cat, hb.values, hb.value_scale,
                 hb.mask_neg, idx, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw,
                 hb.g_geo_vw, sem_d=hb.sem_d, bm=BM, bn=hb.bn, gpt_s=gpt_s,
                 gpt_g=gpt_g)
    ms_e2e = t(retrieve_hier, q, q_xyz, hb, k_tiles=K, bm=BM, tc=TC,
               j_sem=JS, j_geo=JG)
    parts = ms_scan + ms_sort + ms_sel + ms_parts
    print(f"tier={tier} t_pad={hb.t_pad}: scan+tail {ms_scan:.2f}  "
          f"sort {ms_sort:.2f}  select {ms_sel:.2f}  parts {ms_parts:.2f}  "
          f"| sum {parts:.2f}  e2e {ms_e2e:.2f} ms "
          f"({B/ms_e2e*1000:,.0f} q/s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
