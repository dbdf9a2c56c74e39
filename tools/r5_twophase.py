"""Round 5, exp 7: two-phase top-k argmax — measured and REJECTED (PERF.md 5d).

PERF.md 5b named this the remaining top-k throughput lever: the hi/lo
argmax kernel dominates `hier_topk` (K x bn x 3*Dk ~ 38 MFLOP/query at
K=48), so rank candidates with the bf16 qh.kh matmul alone (1/3 the
contraction, half the key stream) and rescore only the survivors with the
exact hi/lo signal.  Two phase-1 designs were built and measured on the
v5e; BOTH lose to the one-phase kernel, so the experiment lives here in
full (kernels included) rather than in the engine:

  (a) global top-R carry: each tile runs e=2 masked-max extractions that
      insert into a running [bm, R] best-list (the `_hier_topk_kernel`
      scheme).  e2e 4.67 ms vs one-phase 4.03 ms at K=48 (R=8).
  (b) per-tile champions (this file): each tile extracts its own top-e
      rows into per-tile columns via one lane select — no insert logic.
      e2e 10.97 ms (e=1, recall 0.9874 — BELOW the 0.999 bar: bf16
      within-tile near-ties lose the true row 1.3%% of the time) /
      19.40 ms (e=2, recall 0.9994).

The stage decomposition (this file, `--stages`) explains both failures:
the one-phase kernel alone runs 3.31 ms ~ 117 TF/s effective — at the
bf16 MXU roofline with ALL of its selection VPU hidden under the matmuls
— while phase 1 at 1/3 the flops only reaches 2.20 ms (the extraction
VPU is exposed once the MXU stops dominating), and ANY exact rescore
costs >= 1.11 ms (XLA row gather at 76-178 GB/s plus batched-matvec
overhead).  The best possible composite (e=2 champions -> top-8 by bf16
score -> rescore 8) is ~2.43 + ~0.15 + 1.11 = 3.7 ms: already worse than
the 3.31 ms one-phase kernel, at LOWER recall (0.9994 vs 0.9998).
Conclusion: emulated-f32 argmax via one fused hi/lo kernel is the optimal
shape for this op on TPU; prefilter schemes cannot win because the chip
has no cheap per-tile argmax (multi-pass VPU extraction) and no fast
random-row gather.
"""
import functools
import sys

import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from range_tpu.ops.retrieval_hier import NEG


def _argmax2_kernel(Dk, e, Cw, idx_ref, qh_ref, kh_ref, mask_ref,
                    out_ref, best_ref, bidx_ref):
    """Phase 1, design (b): per-tile bf16 champions.  Tile j writes its
    top-e rows into columns e*j..e*j+e-1 of the [bm, Cw] scratch via one
    lane select — same single max/argmax VPU pass per tile as the
    one-phase kernel (design (a)'s global carry measured strictly worse:
    its insert logic adds VPU passes that no longer hide under the
    reduced matmul)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, NEG)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    kh = kh_ref[:]
    bn = kh.shape[0]
    l = jnp.dot(qh_ref[:], kh.T, preferred_element_type=jnp.float32)
    l += mask_ref[:]
    i = pl.program_id(0)
    row0 = (idx_ref[i, j] * bn).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (l.shape[0], Cw), 1)
    for t in range(e):
        m = jnp.max(l, axis=1, keepdims=True)  # [bm, 1]
        amax = jnp.min(jnp.where(l >= m, iota, bn), axis=1, keepdims=True)
        if t + 1 < e:
            l = jnp.where(iota == amax, NEG, l)
        put = ciota == e * j + t
        best_ref[:] = jnp.where(put, m, best_ref[:])
        bidx_ref[:] = jnp.where(put, amax.astype(jnp.float32) + row0,
                                bidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, :Cw] = best_ref[:]
        out_ref[:, Cw:] = bidx_ref[:]


@functools.partial(jax.jit, static_argnames=("Dk", "e", "bm", "bn"))
def _argmax2_call(qh, khl, mask_neg, idx, *, Dk, e=1, bm, bn):
    """Returns (bf16 champion scores [Bp, K*e], rows [Bp, K*e] int32)."""
    kh_only = khl[:, :Dk]
    Bp = qh.shape[0]
    nB = Bp // bm
    K = idx.shape[1]
    Cw = (K * e + 127) // 128 * 128

    def kidx(i, g, idx_):
        return (idx_[i, g], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, K),
        in_specs=[
            pl.BlockSpec((bm, Dk), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Dk), kidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2 * Cw), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, Cw), jnp.float32),
                        pltpu.VMEM((bm, Cw), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_argmax2_kernel, Dk, e, Cw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, 2 * Cw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * bn * Dk,
            bytes_accessed=nB * K * bn * Dk * 2 + Bp * Dk * 2,
            transcendentals=0),
    )(idx, qh, kh_only, mask_neg)
    R = K * e
    return out[:, :R], out[:, Cw:Cw + R].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("Dk",))
def _rescore_hilo(qh, ql, khl, scores, rows, *, Dk):
    """Phase 2: exact hi/lo logits (qh.kh + qh.kl + ql.kh, f32 accum) for
    each query's candidate rows, argmax over them.  NEG-sentinel scores
    (unfilled slots) are masked so a fresh rescore of row 0 cannot win."""
    Bp, R = rows.shape
    khl_r = jnp.take(khl, rows.reshape(-1), axis=0,
                     mode="clip").reshape(Bp, R, 2 * Dk)
    kh_r, kl_r = khl_r[..., :Dk], khl_r[..., Dk:]
    lg = jnp.einsum("bd,brd->br", qh, kh_r,
                    preferred_element_type=jnp.float32)
    lg += jnp.einsum("bd,brd->br", qh, kl_r,
                     preferred_element_type=jnp.float32)
    lg += jnp.einsum("bd,brd->br", ql, kh_r,
                     preferred_element_type=jnp.float32)
    lg = jnp.where(scores > NEG * 0.5, lg, NEG)
    return jnp.take_along_axis(rows, jnp.argmax(lg, axis=1)[:, None],
                               axis=1)[:, 0]


def _selection(hb, q, q_xyz, bm, K):
    """The flagship top-k selection stage (scan + select), shared by every
    arm so the comparison isolates the argmax designs."""
    from range_tpu.ops.retrieval_hier import (_hier_scan_stats_call,
                                              _hybrid_order, _pad_queries,
                                              pack_queries, select_tiles)
    from range_tpu.ops.retrieval_pallas import _split_hilo

    B = q.shape[0]
    q_s, q_x = _pad_queries(q, q_xyz, hb, bm)
    q_cat = pack_queries(q_s, None, 12.0, 40.0, tier=hb.tier)
    qh, ql = _split_hilo(q_s)
    q2 = jnp.concatenate([qh, qh], axis=1)
    order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                          hb.t_pad, sort="geo")
    inv = jnp.argsort(order)
    q_cat, q2, ql, qh = q_cat[order], q2[order], ql[order], qh[order]
    m_s, s_s, m_g, s_g = _hier_scan_stats_call(
        q_cat, hb.g_topk_cat, hb.g_geo_cat, bm=bm, tc=16,
        gpt_s=hb.bn // hb.topk_gsz, gpt_g=hb.bn // hb.gsz_geo)
    idx, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real, k_tiles=K,
                          bm=bm, n_valid=B, j_sem=6, j_geo=2, mode="range")
    return q2, qh, ql, idx, inv


def main():
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import (_hier_argmax_call,
                                              hier_topk, prepare_hier_bank)

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    hb = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, lr_geo=384,
        res_rank=128, topk_gsz=8, seed=0,
        cache_path="/tmp/range_bench_hier_cache.npz")
    bm, Dk = 256, hb.bank.key_dim
    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))

    if "--stages" in sys.argv:
        q2, qh, ql, idx, inv = _selection(hb, q, q_xyz, bm, 48)
        ms = C.timeit(_hier_argmax_call, q2, ql, hb.khl_sem, hb.mask_neg,
                      idx, iters=60, Dk=Dk, bm=bm, bn=hb.bn)
        print(f"one-phase kernel alone      : {ms:5.2f} ms", flush=True)
        for e in (1, 2):
            ms = C.timeit(_argmax2_call, qh, hb.khl_sem, hb.mask_neg, idx,
                          iters=60, Dk=Dk, e=e, bm=bm, bn=hb.bn)
            print(f"phase-1 per-tile kernel e={e} : {ms:5.2f} ms", flush=True)
        sc, rows = _argmax2_call(qh, hb.khl_sem, hb.mask_neg, idx, Dk=Dk,
                                 e=2, bm=bm, bn=hb.bn)
        for R in (8, 16, 48, 96):
            ms = C.timeit(_rescore_hilo, qh, ql, hb.khl_sem, sc[:, :R],
                          rows[:, :R], iters=60, Dk=Dk)
            gb = rows.shape[0] * R * 2 * Dk * 2 / 1e9
            print(f"phase-2 rescore R={R:3d}       : {ms:5.2f} ms "
                  f"(gather {gb:.2f} GB -> {gb/ms*1e3:.0f} GB/s)", flush=True)
        return

    for K in (48, 40):
        got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=K))
        rec = float((got == true).mean())
        ms = C.timeit(hier_topk, q, q_xyz, hb, iters=60, k_tiles=K)
        print(f"K={K} one-phase    : {ms:5.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)"
              f" recall@1 {rec:.4f}", flush=True)

        def two_phase(qq, qx, e):
            q2, qh, ql, idx, inv = _selection(hb, qq, qx, bm, K)
            sc, rows = _argmax2_call(qh, hb.khl_sem, hb.mask_neg, idx,
                                     Dk=Dk, e=e, bm=bm, bn=hb.bn)
            return _rescore_hilo(qh, ql, hb.khl_sem, sc, rows,
                                 Dk=Dk)[inv[:B]]

        for e in (1, 2):
            got = np.asarray(two_phase(q, q_xyz, e))
            rec = float((got == true).mean())
            ms = C.timeit(two_phase, q, q_xyz, e, iters=60)
            print(f"K={K} two_phase e={e}: {ms:5.2f} ms "
                  f"({B/ms*1e3/1e6:.2f}M q/s) recall@1 {rec:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
