"""Round 5, exp 1: adjacent query-block tile-list overlap (the dedup lever).

After the geographic sort, adjacent bm-query blocks select heavily
overlapping tile lists (they cover neighboring patches of the sphere).  The
parts kernels' work is  #blocks x K  tile-dispatches; merging f adjacent
blocks into one dispatch with the UNION of their lists costs  #blocks/f x
K_f  — a win of  f*K/K_f  if the union size K_f stays well under f*K.
Fidelity can only improve: every query keeps at least its own block's K
tiles (an exact tile replaces the tail approximation — strictly better).

This tool measures the union-size distribution at the flagship operating
point (100k informative bank, B=10,240, K=32/kg=16, bm=256) to size the
static union budget.  Conclusion feeds ops/retrieval_hier dedup knobs.
"""
import numpy as np

from _tpu_common import standard_fixture, fence

import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval_hier import (
        _hier_scan_stats_call, _hybrid_order, _pad_queries, load_hier_bank,
        select_tiles)
    from range_tpu.ops.retrieval_pallas import pack_queries

    bank, q, q_xyz = standard_fixture()
    hb = load_hier_bank("/tmp/range_bench_hier_cache.npz")
    print("bank t_real", hb.t_real, "t_pad", hb.t_pad, "gsz_sem", hb.gsz_sem)

    bm = 256
    B = q.shape[0]
    q_s, q_x = _pad_queries(q, q_xyz, hb, bm)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                          hb.t_pad, sort="geo")
    q_cat = q_cat[order]
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    m_s, s_s, m_g, s_g = _hier_scan_stats_call(
        q_cat, hb.g_sem_cat, hb.g_geo_cat, bm=bm, tc=16, gpt_s=gpt_s,
        gpt_g=gpt_g)

    for fam, (k, ja, jb, a, b, c, d) in {
            "sem": (32, 3, 2, m_s, s_s, m_g, s_g),
            "geo": (16, 2, 3, m_g, s_g, m_s, s_s)}.items():
        idx, _ = select_tiles(a, b, c, d, t_real=hb.t_real, k_tiles=k,
                              bm=bm, n_valid=B, j_sem=ja, j_geo=jb,
                              mode="range")
        idx = np.asarray(idx)
        nB = idx.shape[0]
        print(f"\n{fam}: K={k}, {nB} blocks")
        for f in (2, 4, 8):
            uni = [len(np.unique(idx[i:i + f])) for i in range(0, nB - nB % f, f)]
            u = np.asarray(uni)
            print(f"  f={f}: union mean {u.mean():.1f} p50 {np.percentile(u, 50):.0f}"
                  f" p95 {np.percentile(u, 95):.0f} max {u.max()}"
                  f"  (budget f*K={f*k}; work ratio @p95 "
                  f"{np.percentile(u, 95)/(f*k):.2f})")


if __name__ == "__main__":
    main()
