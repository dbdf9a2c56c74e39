"""Round 5, exp 2: tile-dedup merged parts dispatches — time + fidelity.

Measures retrieve_hier at the flagship operating point (100k informative
bank, B=10,240, fused combine+concat epilogue) for a grid of
(bm, k_tiles, dedup factor f, union budget k_union), against the f32 exact
dense reference.  k_union is sized from the measured per-config union-size
distribution (p95 -> ~no truncation; mean -> mild truncation of the
lowest-ranked fill tiles).

Hypothesis (r5_overlap.py): at bm=256 adjacent blocks overlap weakly
(union p95/f*K ~ 0.91 at f=2) because 40 geo-sorted blocks each own a
distinct region; at bm=128 the regions halve and overlap doubles — and
selection fidelity strictly improves at equal K (tighter unions).
"""
import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def union_p(idx, f, pct):
    nB = idx.shape[0]
    u = [len(np.unique(idx[i:i + f])) for i in range(0, nB - nB % f, f)]
    return int(np.percentile(u, pct))


def main():
    from range_tpu.ops.retrieval import retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import (
        _hier_scan_stats_call, _hybrid_order, _pad_queries, load_hier_bank,
        retrieve_hier, select_tiles)
    from range_tpu.ops.retrieval_pallas import pack_queries

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    hb = load_hier_bank("/tmp/range_bench_hier_cache.npz")
    print("bank:", hb.t_real, "tiles; lr", hb.lr_rank, "lrg", hb.lr_geo,
          "rr", hb.res_rank, flush=True)
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)
    Dv = ref.shape[1]

    # per-bm union-size stats to size k_union
    uni = {}
    for bm in (128, 256):
        q_s, q_x = _pad_queries(q, q_xyz, hb, bm * 8)
        q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
        order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                              hb.t_pad, sort="geo")
        q_cat = q_cat[order]
        m_s, s_s, m_g, s_g = _hier_scan_stats_call(
            q_cat, hb.g_sem_cat, hb.g_geo_cat, bm=bm, tc=16,
            gpt_s=hb.bn // hb.gsz_sem, gpt_g=hb.bn // hb.gsz_geo)
        for K, kg in ((32, 16), (24, 12)):
            idx, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                                  k_tiles=K, bm=bm, n_valid=B, j_sem=3,
                                  j_geo=2, mode="range")
            for f in (2, 4, 8):
                uni[(bm, K, f)] = (union_p(idx, f, 50), union_p(idx, f, 95))
                print(f"bm={bm} K={K} f={f}: union p50/p95 "
                      f"{uni[(bm, K, f)]}", flush=True)

    def run(tag, **kw):
        out = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q,
                                       scan_bm=512, **kw))[:, :Dv]
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      concat_query=q, scan_bm=512, **kw)
        print(f"{tag:44s} {ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s) "
              f"relerr mean {rel.mean()*100:.2f}% "
              f"p99 {np.percentile(rel, 99)*100:.2f}%", flush=True)
        return ms

    base = dict(k_tiles=32, j_sem=3, k_geo=16)
    run("flagship base bm256 K32/kg16", bm=256, **base)
    for bm in (256, 128):
        for f in (2, 4, 8):
            for pct in (0, 1):  # 0 -> p50 budget, 1 -> p95 budget
                ku = uni[(bm, 32, f)][pct]
                run(f"dedup bm{bm} K32 f={f} ku={ku}"
                    f" ({'p50' if pct == 0 else 'p95'})",
                    bm=bm, dedup=f, k_union=ku, **base)
    run("base bm128 K24/kg12", bm=128, k_tiles=24, j_sem=3, k_geo=12)
    ku = uni[(128, 24, 8)][1]
    run(f"dedup bm128 K24 f=8 ku={ku} (p95)", bm=128, dedup=8, k_union=ku,
        k_tiles=24, j_sem=3, k_geo=12)


if __name__ == "__main__":
    main()
