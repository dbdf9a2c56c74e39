"""Round 5, exp 10: attack the scan's exp2 floor with gsz_sem=32.

5e located the fused scan's floor: at the flagship point it runs AT the
bf16 MXU roofline (110.8 TF/s) and pins against its 92M-exp2 tail-mass
stream (~86 G/s saturated) — which selection sketches cannot remove, but
COARSER GROUPS can: gsz_sem=32 halves the sem group count, halving the
scan's exp2 stream AND its logit+tail matmul rows, and also halves the
parts kernels' group-approximation work.  The price is a coarser fine
tail (4d measured gsz8→16 at ~0.2% mean); the top-k recall bar is
structurally unaffected (hier_topk selects on the separate topk_gsz=8
operand).  Sweeps gsz32 at res128/res256 (the efficient tail knob can
buy the coarseness back) vs the flagship baseline — ms, relerr mean/p99.
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

    def run(tag, cache, gsz, rr, **kw):
        hb = prepare_hier_bank(
            bank, bn=512, gsz_sem=gsz, gsz_geo=64, lr_rank=256, lr_geo=384,
            res_rank=rr, topk_gsz=8, seed=0, cache_path=cache)
        out = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q,
                                       scan_bm=512, **kw))[:, :Dv]
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      concat_query=q, scan_bm=512, **kw)
        print(f"{tag:28s} {ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s) "
              f"relerr mean {rel.mean()*100:.2f}% "
              f"p99 {np.percentile(rel, 99)*100:.2f}%", flush=True)

    kw = dict(k_tiles=32, j_sem=3, k_geo=16)
    run("flagship gsz16 res128 (base)", "/tmp/range_bench_hier_cache.npz",
        16, 128, **kw)
    run("gsz32 res128", "/tmp/r5_g32.npz", 32, 128, **kw)
    run("gsz32 res256", "/tmp/r5_g32r256.npz", 32, 256, **kw)


if __name__ == "__main__":
    main()
