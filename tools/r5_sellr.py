"""Round 5, exp 9: feature-path selection+tail sketch (sel_lr), measured.

The last untried VERDICT r4 #1 design: the flagship scan spends
gpt_s x sem_d = 32x256 logit mults per (query, tile) on a signal that
drives (a) tile selection ranking and (b) the UNSELECTED groups' tail
mass; neither needs full-width logits.  `sel_lr=k` contracts a rank-k PCA
sketch of the sem group centroids in BOTH the scan and the parts kernels'
group-approximation — identical sketched logits on both sides keep the
exact-minus-approx telescope exact on selected tiles (range semantics:
/root/reference/range/range.py:209-240 — only temps/top-p there; all
tiling is ours).

Scan flop accounting at the flagship point (per query-tile pair):
sem logits 32x256 = 8192, sem tail 32x257 = 8224, geo 8x(128+385) = 4104;
sel_lr=64 cuts the first term 4x -> ~30% of scan flops, and the scan is
~half of retrieval time (VERDICT r4).  Measures ms + relerr mean/p99 +
flagship-bar fidelity for sel_lr in {off, 128, 96, 64} at the bench
config (B=10,240, 100k informative bank, concat_query epilogue).
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

    import dataclasses

    from range_tpu.ops.retrieval_hier import _lowrank_centroid_factor

    hb0 = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
        res_rank=128, topk_gsz=8, seed=0,
        cache_path="/tmp/range_bench_hier_cache.npz")

    def run(sl, **kw):
        if sl:
            # identical to build_hier_bank(sel_lr=sl)'s operand: the sketch
            # is a pure function of g_sem_cat (tested complete-rank/partial
            # in tests/test_hier.py::test_sel_lr_feature_path) — deriving it
            # here skips 3 redundant ~5-min bank builds
            g_sel, p_sel = _lowrank_centroid_factor(hb0.g_sem_cat, sl)
            hb = dataclasses.replace(hb0, g_sem_sel=g_sel, p_sel=p_sel,
                                     sel_lr=sl)
        else:
            hb = hb0
        out = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q,
                                       scan_bm=512, **kw))[:, :Dv]
        rel = np.abs(out - ref) / den
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      concat_query=q, scan_bm=512, **kw)
        print(f"sel_lr={sl:3d} K={kw.get('k_tiles')}: {ms:6.2f} ms "
              f"({B/ms*1e3/1e6:.2f}M q/s) relerr mean {rel.mean()*100:.2f}% "
              f"p99 {np.percentile(rel, 99)*100:.2f}%", flush=True)

    for sl in (0, 128, 96, 64):
        run(sl, k_tiles=32, j_sem=3, k_geo=16)


if __name__ == "__main__":
    main()
