"""Round-4: mass-bound-adaptive rescue sweep on TPU (VERDICT r3 #3).

The flagship's feature relerr tail is fat (mean 2.6% / p99 10.7%) and
concentrates in queries whose selected tiles carry little of their exp-mass.
retrieve_hier(adaptive_frac=f, adaptive_mult=m) re-runs the PARTS kernels
(scan stats are selection-independent) for the worst-coverage f*B queries
with an m-x wider selection.  This sweeps (f, m) on the flagship config and
reports relerr mean/p99/max + throughput vs the f=0 baseline.

Bar: p99 <= 5% at <= 10% throughput cost.
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval import retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import prepare_hier_bank, retrieve_hier

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                           lr_rank=256, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/range_bench_hier_cache.npz")
    print("bank prepared", flush=True)

    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)
    kw = dict(k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)

    base_ms = None
    for f, m in ((0.0, 3), (0.05, 3), (0.05, 4), (0.10, 3), (0.10, 4),
                 (0.15, 4)):
        out = np.asarray(retrieve_hier(q, q_xyz, hb, adaptive_frac=f,
                                       adaptive_mult=m, **kw))
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      adaptive_frac=f, adaptive_mult=m, **kw)
        if base_ms is None:
            base_ms = ms
        print(f"f={f:.2f} m={m}: relerr mean {rel.mean()*100:5.2f}% "
              f"p99 {np.percentile(rel, 99)*100:5.2f}% "
              f"max {rel.max()*100:5.1f}%  {ms:5.2f} ms "
              f"({(ms/base_ms-1)*100:+.1f}% vs f=0)", flush=True)


if __name__ == "__main__":
    main()
