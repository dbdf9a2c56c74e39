"""Round-4 parts-side lever: wider query blocks with a wider K.

Parts cost scales ~K/bm (grid nB*K with per-step work linear in bm): bm=512
at equal K halves the grid AND halves operand streaming, but 512 queries
sharing K tiles span more sphere per tile (measured r3c: bm512/K32 was
0.4 ms faster at relerr 2.65 -> 3.01%, topk recall -0.0009).  The un-tried
half: spend part of the saving on MORE tiles per (wider) block —
K48/bm512 costs 0.75x of K32/bm256 while a 512-query window under bm256
already unions ~40-50 distinct tiles from its two selections.

Sweeps (bm, K, j) x {lr_geo 0/384} for throughput + relerr; recall rides
the topk endpoint (own auto-widen policy) and is spot-checked at the end.
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
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)

    base = dict(bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, res_rank=128,
                topk_gsz=8, seed=0)
    banks = {
        "": prepare_hier_bank(bank,
                              cache_path="/tmp/range_bench_hier_cache.npz",
                              **base),
        "+lrg384": prepare_hier_bank(bank, lr_geo=384,
                                     cache_path="/tmp/r4_geolr384.npz",
                                     **base),
    }

    def bench(tag, hb, **kw):
        kw.setdefault("scan_bm", 512)
        out = np.asarray(retrieve_hier(q, q_xyz, hb, **kw))
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, **kw)
        print(f"{tag:34s} {ms:5.2f} ms ({B/ms*1e3/1e6:.2f}M q/s) relerr "
              f"mean {rel.mean()*100:5.2f}% p99 "
              f"{np.percentile(rel, 99)*100:5.2f}%", flush=True)

    for bt, hb in banks.items():
        bench(f"bm256 K32/j3/kg16 {bt} (base)", hb, k_tiles=32, j_sem=3,
              k_geo=16, bm=256)
        bench(f"bm512 K48/j3/kg24 {bt}", hb, k_tiles=48, j_sem=3, k_geo=24,
              bm=512)
        bench(f"bm512 K48/j4/kg24 {bt}", hb, k_tiles=48, j_sem=4, k_geo=24,
              bm=512)
        bench(f"bm512 K56/j4/kg28 {bt}", hb, k_tiles=56, j_sem=4, k_geo=28,
              bm=512)
        bench(f"bm512 K40/j3/kg20 {bt}", hb, k_tiles=40, j_sem=3, k_geo=20,
              bm=512)

    # recall spot-check on the winner shape (topk endpoint, bm512 path)
    true = np.asarray(exact_nn(q, banks[""].bank, chunk=4096))
    for bm, K in ((256, 48), (512, 72)):
        got = np.asarray(hier_topk(q, q_xyz, banks[""], k_tiles=K, bm=bm))
        ms = C.timeit(hier_topk, q, q_xyz, banks[""], iters=50, k_tiles=K,
                      bm=bm)
        print(f"topk bm{bm} K{K}: recall@1 {(got == true).mean():.4f} "
              f"{ms:5.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)", flush=True)


if __name__ == "__main__":
    main()
