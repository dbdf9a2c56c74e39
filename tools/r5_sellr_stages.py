"""Round 5, exp 9b: WHY sel_lr only buys ~3% — scan-stage decomposition.

r5_sellr measured the rank-k selection sketch at flat fidelity but only
-0.12 ms of the 3.85 ms flagship retrieval, vs the ~15% the flop
accounting predicted.  This times the fused scan kernel in isolation
(full vs sketched sem operand) and reconciles against its flop split
(sem logits / sem tail / geo / transcendentals) to locate the scan's
actual binding resource.
"""
import dataclasses

import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval_hier import (_hier_scan_call,
                                              _lowrank_centroid_factor,
                                              prepare_hier_bank)
    from range_tpu.ops.retrieval_pallas import pack_queries

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    hb = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
        res_rank=128, topk_gsz=8, seed=0,
        cache_path="/tmp/range_bench_hier_cache.npz")
    q_cat = pack_queries(q, q_xyz, 12.0, 40.0, tier=hb.tier)
    Bp = (B + 511) // 512 * 512
    q_cat = jnp.pad(q_cat, ((0, Bp - B), (0, 0)))
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    sem_vw = hb.g_sem_vw_lr
    geo_vw = hb.g_geo_vw_lr

    def t_scan(gs, qc, tag):
        ms = C.timeit(_hier_scan_call, qc, gs, hb.g_geo_cat, sem_vw, geo_vw,
                      iters=60, bm=512, tc=16, gpt_s=gpt_s, gpt_g=gpt_g)
        gb = (gs.nbytes + hb.g_geo_cat.nbytes + sem_vw.nbytes + geo_vw.nbytes
              ) * (Bp // 512) / 1e9
        fl = 2 * Bp * hb.t_pad * (gpt_s * gs.shape[1] + gpt_s * sem_vw.shape[1]
                                  + gpt_g * (qc.shape[1] + geo_vw.shape[1]))
        tr = Bp * hb.t_pad * (gpt_s + gpt_g)
        print(f"{tag:22s} {ms:5.2f} ms  operands {gb:5.1f} GB "
              f"({gb/ms*1e3:5.0f} GB/s)  {fl/1e9:6.0f} GFLOP "
              f"({fl/ms/1e9:5.1f} TF/s)  exp2 {tr/1e6:.0f}M "
              f"({tr/ms*1e3/1e9:.1f} G/s)", flush=True)

    t_scan(hb.g_sem_cat, q_cat, "scan full (256)")
    for k in (128, 64):
        g_sel, p_sel = _lowrank_centroid_factor(hb.g_sem_cat, k)
        q_sel = (q_cat[:, :hb.sem_d].astype(jnp.float32) @ p_sel.T
                 ).astype(q_cat.dtype)
        q_sc = jnp.concatenate([q_sel, q_cat[:, hb.sem_d:]], axis=1)
        t_scan(g_sel, q_sc, f"scan sketched ({k})")


if __name__ == "__main__":
    main()
