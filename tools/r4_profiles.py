"""Round-4 PROFILES table evidence (VERDICT r3 #7): measured bars for the
named serving profiles that don't already carry them.

flagship's row is bench.py's job (throughput + recall@1 + relerr + probe
gates); `exact` is the dense reference (recall/probe gaps are 0 by
construction) so only its throughput needs a number.  This measures:
  * turbo feature path (K8/j2/kg4): throughput + relerr vs f32 dense
  * turbo top-k endpoint: recall@1 + throughput at K=24 and K=48
  * exact dense path: throughput
One lean process, no full encoders (tower excluded — retrieval-only rows;
e2e adds the fixed ~0.73 ms tower term).
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval import exact_nn, retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import (hier_topk, prepare_hier_bank,
                                              retrieve_hier)

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256,
                           res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/range_bench_hier_cache.npz")
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)
    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))

    # exact profile: the SERVING dense path is the fused Pallas kernel
    # (retrieval_pallas.retrieve_pallas), not the XLA reference
    from range_tpu.ops.retrieval_pallas import retrieve_pallas

    ms = C.timeit(retrieve_pallas, q, q_xyz, bank, iters=50, sem_temp=12.0,
                  geo_temp=40.0, beta=0.5)
    print(f"exact   dense fused kernel   {ms:6.2f} ms ({B/ms*1e3/1e6:.3f}M "
          f"q/s) relerr 0 recall 1.0 (by construction)", flush=True)

    # turbo profile: feature path K8/j2/kg4 (api.SERVING_PROFILES['turbo'])
    tkw = dict(k_tiles=8, j_sem=2, k_geo=4, scan_bm=512)
    out = np.asarray(retrieve_hier(q, q_xyz, hb, **tkw))
    rel = np.abs(out - ref) / den
    ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, **tkw)
    print(f"turbo   features K8/j2/kg4   {ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M "
          f"q/s) relerr mean {rel.mean()*100:.2f}% "
          f"p99 {np.percentile(rel, 99)*100:.2f}%", flush=True)

    for K in (24, 48):
        got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=K))
        rec = float((got == true).mean())
        ms = C.timeit(hier_topk, q, q_xyz, hb, iters=50, k_tiles=K)
        print(f"turbo/flagship topk K={K:2d}    {ms:6.2f} ms "
              f"({B/ms*1e3/1e6:.2f}M q/s) recall@1 {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
