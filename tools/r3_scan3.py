import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Scan VPU-chain attack: stats-only costs ~80% of the full scan
(r3_scan2), so the per-tile segment reductions + exp2 are the wall, not
the matmuls.  Variants: (A) ss/sg via a [tc, G_tc] one-hot MXU matmul
instead of the VPU reshape-sum; (B) same inside the full (tail) kernel;
(C) bigger tc (fewer grid steps); (D) gsz_sem=16 bank (half the groups:
halves logits AND exp2 AND reductions — tail-fidelity must be re-probed
separately before adopting)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

import range_tpu
from range_tpu.ops.retrieval_hier import (_hier_scan_call,
                                          _hier_scan_stats_call,
                                          _pad_queries, CLAMP2,
                                          build_hier_bank)
from range_tpu.ops.retrieval_pallas import pack_queries
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, **kw):
    # deep-queue timer: shallow loops measure the ~3.5 ms/call tunnel
    # feed rate, not the device (PERF.md round 3b)
    from _tpu_common import timeit

    return timeit(fn, *a, **kw)


def _seg(tc, G, dtype):
    gpt = G // tc
    return (jax.lax.broadcasted_iota(jnp.int32, (tc, G), 1) // gpt
            == jax.lax.broadcasted_iota(jnp.int32, (tc, G), 0)
            ).astype(dtype)


def _scan_kernel_mxu(gpt_s, gpt_g, tc, has_geo, full, qt_ref, gs_ref, gg_ref,
                     *rest):
    if full:
        (vs_ref, vg_ref, ms_ref, ss_ref, mg_ref, sg_ref, tail_ref,
         accs_ref, accg_ref) = rest
    else:
        ms_ref, ss_ref, mg_ref, sg_ref = rest
    if full:
        c0 = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c0 == 0)
        def _():
            accs_ref[:] = jnp.zeros_like(accs_ref)
            if has_geo:
                accg_ref[:] = jnp.zeros_like(accg_ref)

    qt = qt_ref[:]
    ws = gs_ref.shape[1]
    wg = gg_ref.shape[1]
    sl = jnp.dot(gs_ref[:], qt[:ws], preferred_element_type=jnp.float32)
    es = jnp.exp2(jnp.minimum(sl, CLAMP2)).astype(jnp.bfloat16)
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    eg = jnp.exp2(jnp.minimum(gl, CLAMP2)).astype(jnp.bfloat16)
    bm_ = sl.shape[1]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    # per-tile exp-mass via the MXU: seg [tc, G] @ es [G, bm] -> (tc, bm)
    ss_ref[:] = jnp.dot(_seg(tc, es.shape[0], es.dtype), es,
                        preferred_element_type=jnp.float32)
    sg_ref[:] = jnp.dot(_seg(tc, eg.shape[0], eg.dtype), eg,
                        preferred_element_type=jnp.float32)
    if full:
        vs = vs_ref[:]
        accs_ref[:] += jax.lax.dot_general(
            es.astype(vs.dtype), vs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_geo:
            vg = vg_ref[:]
            accg_ref[:] += jax.lax.dot_general(
                eg.astype(vg.dtype), vg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(c0 == nc - 1)
        def _():
            Ws = accs_ref.shape[1]
            tail_ref[:, :Ws] = accs_ref[:]
            if has_geo:
                tail_ref[:, Ws:] = accg_ref[:]
            else:
                tail_ref[:, Ws:] = jnp.zeros_like(tail_ref[:, Ws:])


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g",
                                             "full"))
def scan_mxu_call(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
                  bm, tc, gpt_s, gpt_g, full=True):
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    Ws = g_sem_vw.shape[1]
    Wg = g_geo_vw.shape[1]
    grid = (Bp // bm, t_pad // tc)
    in_specs = [
        pl.BlockSpec((cat_d, bm), lambda i, c: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tc * gpt_s, g_sem_cat.shape[1]),
                     lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tc * gpt_g, g_geo_cat.shape[1]),
                     lambda i, c: (c, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q_cat.T, g_sem_cat, g_geo_cat]
    stat_specs = [pl.BlockSpec((tc, bm), lambda i, c: (c, i),
                               memory_space=pltpu.VMEM)] * 4
    stat_shapes = [jax.ShapeDtypeStruct((t_pad, Bp), jnp.float32)] * 4
    if full:
        in_specs += [
            pl.BlockSpec((tc * gpt_s, Ws), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, Wg), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [g_sem_vw, g_geo_vw]
        out_specs = stat_specs + [pl.BlockSpec((bm, Ws + Wg),
                                               lambda i, c: (i, 0),
                                               memory_space=pltpu.VMEM)]
        out_shape = stat_shapes + [jax.ShapeDtypeStruct((Bp, Ws + Wg),
                                                        jnp.float32)]
        scratch = [pltpu.VMEM((bm, Ws), jnp.float32),
                   pltpu.VMEM((bm, Wg), jnp.float32)]
    else:
        out_specs, out_shape, scratch = stat_specs, stat_shapes, []
    out = pl.pallas_call(
        functools.partial(_scan_kernel_mxu, gpt_s, gpt_g, tc, True, full),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*operands)
    return out


def main():
    from _tpu_common import standard_fixture

    print("device:", jax.devices()[0], flush=True)
    B = 10_240
    bank, q, q_xyz = standard_fixture(b=B)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               seed=0, chunk=4096, lr_rank=256, res_rank=256,
                               hier_cache="/tmp/r3res_512+res256.npz")
    hb = enc.extra
    lap("bank ready")
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    q_s, q_x = _pad_queries(q, q_xyz, hb, 256)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    sem_vw = hb.g_sem_vw_lr if hb.g_sem_vw_lr is not None else hb.g_sem_vw
    args = (q_cat, hb.g_sem_cat, hb.g_geo_cat, sem_vw, hb.g_geo_vw)

    for SB, TC in ((512, 16), (512, 32), (512, 56)):
        for full in (False, True):
            try:
                ms = t(scan_mxu_call, *args, bm=SB, tc=TC, gpt_s=gpt_s,
                       gpt_g=gpt_g, full=full)
                lap(f"mxu-sum bm={SB} tc={TC} {'full' if full else 'stats'}:"
                    f" {ms:.2f} ms")
            except Exception as e:
                lap(f"FAIL mxu bm={SB} tc={TC} full={full}: {str(e)[:140]}")

    # numeric sanity vs production
    a = _hier_scan_call(*args, bm=512, tc=16, gpt_s=gpt_s, gpt_g=gpt_g)
    b = scan_mxu_call(*args, bm=512, tc=32, gpt_s=gpt_s, gpt_g=gpt_g,
                      full=True)
    b = tuple(o.T for o in b[:4]) + (b[4],)
    for nm, x, y in zip(("ms", "ss", "mg", "sg", "tail"), a, b):
        x, y = np.asarray(x), np.asarray(y)
        rel = np.abs(x - y) / np.maximum(np.abs(x), 1e-4)
        lap(f"  {nm}: maxrel {rel.max():.4f} meanrel {rel.mean():.6f}")

    # gsz16: half the sem groups (tail granularity coarsens: probe TBD)
    del enc, hb
    hb16 = build_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                           lr_rank=256, res_rank=256, seed=0)
    lap("gsz16 bank ready")
    gpt_s16 = hb16.bn // hb16.gsz_sem
    sem_vw16 = hb16.g_sem_vw_lr
    args16 = (q_cat, hb16.g_sem_cat, hb16.g_geo_cat, sem_vw16,
              hb16.g_geo_vw)
    for TC in (16, 32):
        ms = t(_hier_scan_call, *args16, bm=512, tc=TC, gpt_s=gpt_s16,
               gpt_g=gpt_g)
        ms2 = t(scan_mxu_call, *args16, bm=512, tc=TC, gpt_s=gpt_s16,
                gpt_g=gpt_g, full=True)
        lap(f"gsz16 tc={TC}: prod {ms:.2f} ms, mxu-sum {ms2:.2f} ms")
    from range_tpu.ops.retrieval_hier import retrieve_hier
    ms = t(retrieve_hier, q, q_xyz, hb16, bm=256, k_tiles=32, j_sem=3,
           k_geo=16, scan_bm=512)
    lap(f"gsz16 retrieve_hier e2e: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")


if __name__ == "__main__":
    main()
