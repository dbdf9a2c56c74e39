"""Round-4 weighted-supergroup tail (tail_super) sweep on TPU.

The scan's sem tail matmul contracts tail_super/gsz_sem x fewer rows; the
correction kernel restores the exact fine tail on the selected K + m_corr
tiles.  Sweeps (tail_super, k_tiles, m_corr) against the flagship baseline:
throughput (retrieve_hier, deep-queue timing) + feature relerr vs the
f32-exact dense reference.  The telescope identity means the K exact tiles
are bit-consistent at any m_corr >= 0; fidelity differences come only from
the un-corrected tiles' supergroup-mean values.
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
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)

    def bench(tag, hb, **kw):
        kw.setdefault("j_sem", 3)
        kw.setdefault("scan_bm", 512)
        out = np.asarray(retrieve_hier(q, q_xyz, hb, **kw))
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, **kw)
        print(f"{tag:34s} {ms:5.2f} ms ({q.shape[0]/ms*1e3/1e6:.2f}M q/s) "
              f"relerr mean {rel.mean()*100:5.2f}% "
              f"p99 {np.percentile(rel, 99)*100:5.2f}%", flush=True)

    base_kw = dict(bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256,
                   res_rank=128, topk_gsz=8, seed=0)
    hb0 = prepare_hier_bank(bank, cache_path="/tmp/range_bench_hier_cache.npz",
                            **base_kw)
    bench("flagship K32/kg16", hb0, k_tiles=32, k_geo=16)

    for ts in (64, 128):
        hb = prepare_hier_bank(bank, tail_super=ts,
                               cache_path=f"/tmp/r4_ts{ts}.npz", **base_kw)
        print(f"built tail_super={ts}", flush=True)
        bench(f"ts{ts} K32/m0/kg16 (scan-only win)", hb, k_tiles=32,
              k_geo=16, m_corr=0)
        bench(f"ts{ts} K32/m32/kg16", hb, k_tiles=32, k_geo=16, m_corr=32)
        bench(f"ts{ts} K16/m48/kg16", hb, k_tiles=16, k_geo=16, m_corr=48)
        bench(f"ts{ts} K16/m48/kg12", hb, k_tiles=16, k_geo=12, m_corr=48)
        bench(f"ts{ts} K20/m60/kg16 j4", hb, k_tiles=20, k_geo=16,
              m_corr=60, j_sem=4)


if __name__ == "__main__":
    main()
