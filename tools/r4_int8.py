"""Round-4 lever probes (one lean TPU process, VERDICT r3 #1):

1. int8 MXU rate: does jnp.dot(int8, int8 -> int32/f32) reach ~2x the
   measured ~105 TF/s bf16 practical peak on this chip?  (Round 3 rejected
   int8 VALUES — bandwidth, a wash; this is int8 LOGITS — compute.)
   Measured at a big square shape and at the parts kernel's logits shape.
2. Scan tail-width sensitivity: time _hier_scan_call with the sem tail
   operand sliced to widths {257 (lr256, shipped), 129, 65, 33} — the upper
   bound of the weighted-supergroup tail saving (same stats, narrower tail
   matmul).
"""
import functools

import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def matmul_rate(m, k, n, dtype, acc, iters=60):
    a = jnp.asarray(np.random.default_rng(0).integers(-100, 100, (m, k)),
                    dtype)
    b = jnp.asarray(np.random.default_rng(1).integers(-100, 100, (k, n)),
                    dtype)

    @jax.jit
    def f(a, b):
        return jnp.dot(a, b, preferred_element_type=acc)

    ms = C.timeit(f, a, b, iters=iters)
    tf = 2 * m * k * n / (ms * 1e-3) / 1e12
    print(f"  [{m}x{k}x{n}] {dtype.__name__}->{acc.__name__}: "
          f"{ms:6.3f} ms = {tf:6.1f} T{'OP' if dtype==jnp.int8 else 'FLOP'}/s",
          flush=True)
    return tf


def main():
    print("device:", jax.devices()[0], flush=True)

    print("1) MXU rate, big square:", flush=True)
    matmul_rate(8192, 8192, 8192, jnp.bfloat16, jnp.float32)
    matmul_rate(8192, 8192, 8192, jnp.int8, jnp.int32)
    matmul_rate(8192, 8192, 8192, jnp.int8, jnp.float32)
    print("   parts-logits shape (bm*K-steps emulated as one tall matmul):",
          flush=True)
    # parts: per (bm=256 block, tile): [256, 288]@[288, 512]; emulate the
    # arithmetic as [10240, 288] @ [288, 65536]
    matmul_rate(10240, 288, 65536, jnp.bfloat16, jnp.float32)
    matmul_rate(10240, 288, 65536, jnp.int8, jnp.int32)

    print("2) scan tail-width sensitivity (flagship bank):", flush=True)
    from range_tpu.ops.retrieval_hier import (_hier_scan_call,
                                              prepare_hier_bank, _pad_queries,
                                              _hybrid_order)
    from range_tpu.ops.retrieval_pallas import pack_queries

    bank, q, q_xyz = C.standard_fixture()
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                           lr_rank=256, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/range_bench_hier_cache.npz")
    q_s, q_x = _pad_queries(q, q_xyz, hb, 256)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32),
                          q.shape[0], hb.t_pad, sort="geo")
    q_cat = jnp.asarray(np.asarray(q_cat[order]))
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    for ws in (257, 129, 65, 33):
        vw = jnp.asarray(np.asarray(hb.g_sem_vw_lr[:, :ws]))
        f = functools.partial(_hier_scan_call, bm=512, tc=16, gpt_s=gpt_s,
                              gpt_g=gpt_g, has_geo=True)
        ms = C.timeit(f, q_cat, hb.g_sem_cat, hb.g_geo_cat, vw, hb.g_geo_vw_lr
                      if hb.g_geo_vw_lr is not None else hb.g_geo_vw,
                      iters=60)
        print(f"  sem tail width {ws:3d}: scan {ms:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
