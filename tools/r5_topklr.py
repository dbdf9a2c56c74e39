"""Round 5, exp 6: low-rank top-k selection operand — recall + throughput.

hier_topk's cost is dominated by the fine (topk_gsz=8) stats scan: 28,672
group logits x sem_d=256 contraction per query.  topk_lr=k contracts k
instead (the scan is a pure selection signal there — only recall can
move).  Measures hier_topk at the bench config (K=48) and K=40 for
topk_lr in {off, 128, 64} on the flagship 100k bank: recall@1 vs
HIGHEST-precision exact NN + steady-state ms.
"""
import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import hier_topk, prepare_hier_bank

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    true = None
    for tl in (0, 128, 64):
        hb = prepare_hier_bank(
            bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
            res_rank=128, topk_gsz=8, topk_lr=tl, seed=0,
            cache_path=(f"/tmp/r5_tk{tl}.npz" if tl
                        else "/tmp/range_bench_hier_cache.npz"))
        if true is None:
            true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
        for K in (48, 40):
            got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=K))
            rec = float((got == true).mean())
            ms = C.timeit(hier_topk, q, q_xyz, hb, iters=60, k_tiles=K)
            print(f"topk_lr={tl:3d} K={K}: {ms:5.2f} ms "
                  f"({B/ms*1e3/1e6:.2f}M q/s) recall@1 {rec:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
