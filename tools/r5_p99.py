"""Round 5, exp 7: the p99 <= 5% question (VERDICT r4 #4), measured.

Round 4d decomposed the flagship's 10.8% relerr p99 into the res_rank-128
truncation (~3.8%) + the K32 selection floor (6.25% with EVERY
approximation off).  The untried structural idea (per-segment residual
eigenbases) measured: per-tile rank-64 captures 75% of residual energy
(= global rank-256) but forces the unprojection into the per-tile grid
step — cost-dominated by plain res_rank=256 (tools/r5_segbasis.py).  So
p99 <= 5% requires BOTH higher residual rank AND wider exact selection;
this tool finds the cheapest such config on the res256 bank:
  * straight K widening (K48/kg24, K64/kg32),
  * dedup-bought widening (K32 f2, K48 f2 — coverage ~1.6x K at ~1.26x
    cost, the round-5 dedup lever's actual use),
against the flagship baseline.  Done-bar bookkeeping: p99 <= 5% at <= +15%
retrieval cost, or the measured cheapest config + explicit rejection.
"""
import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval import retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import prepare_hier_bank, retrieve_hier

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)
    Dv = ref.shape[1]

    hb128 = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
        res_rank=128, topk_gsz=8, seed=0,
        cache_path="/tmp/range_bench_hier_cache.npz")
    hb256 = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
        res_rank=256, topk_gsz=8, seed=0, cache_path="/tmp/r5_res256.npz")

    def run(tag, hb, **kw):
        out = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q,
                                       scan_bm=512, **kw))[:, :Dv]
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      concat_query=q, scan_bm=512, **kw)
        print(f"{tag:36s} {ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s) "
              f"relerr mean {rel.mean()*100:.2f}% "
              f"p99 {np.percentile(rel, 99)*100:.2f}%", flush=True)

    run("flagship res128 K32/kg16 (base)", hb128, k_tiles=32, j_sem=3,
        k_geo=16)
    run("res256 K32/kg16", hb256, k_tiles=32, j_sem=3, k_geo=16)
    run("res256 K48/kg24", hb256, k_tiles=48, j_sem=4, k_geo=24)
    run("res256 K64/kg32", hb256, k_tiles=64, j_sem=4, k_geo=32)
    run("res256 K32 f2 ku58", hb256, k_tiles=32, j_sem=3, k_geo=16,
        dedup=2, k_union=58)
    run("res256 K48 f2 ku78", hb256, k_tiles=48, j_sem=4, k_geo=24,
        dedup=2, k_union=78)
    run("res256 K64 f2 ku100", hb256, k_tiles=64, j_sem=4, k_geo=32,
        dedup=2, k_union=100)


if __name__ == "__main__":
    main()
