import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""bf16-exp2 microbench: the scan kernel's VPU chain (exp2 + casts +
segment reductions over ~[tc*gpt, bm] blocks) is comparable to its MXU
time at ~46% MFU — if Mosaic's bf16 exp2 runs at 2x f32 rate, computing
es in bf16 (it feeds a bf16 matmul anyway; ss sums with f32 accumulation)
buys real scan time.  Times the production scan vs a bf16-exp2 copy, and
the parts-family kernel likewise (p in bf16: numerator AND denominator
then share one p — today's kernel mixes f32-d / bf16-matmul)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

import range_tpu
from range_tpu.ops import retrieval_hier as rh
from range_tpu.ops.retrieval_hier import (_hier_scan_call, _hier_scan_kernel,
                                          CLAMP2)
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


def _scan_kernel_bf(gpt_s, gpt_g, tc, has_geo, qt_ref, gs_ref, gg_ref,
                    vs_ref, vg_ref, ms_ref, ss_ref, mg_ref, sg_ref,
                    tail_ref, accs_ref, accg_ref):
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
    es = jnp.exp2(jnp.minimum(sl, CLAMP2).astype(jnp.bfloat16))
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    eg = jnp.exp2(jnp.minimum(gl, CLAMP2).astype(jnp.bfloat16))
    bm_ = sl.shape[1]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    ss_ref[:] = jnp.sum(es.reshape(tc, gpt_s, bm_), axis=1,
                        dtype=jnp.float32)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    sg_ref[:] = jnp.sum(eg.reshape(tc, gpt_g, bm_), axis=1,
                        dtype=jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g"))
def scan_bf_call(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
                 bm, tc, gpt_s, gpt_g):
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    Ws = g_sem_vw.shape[1]
    Wg = g_geo_vw.shape[1]
    nB = Bp // bm
    grid = (nB, t_pad // tc)
    q_t = q_cat.T
    out = pl.pallas_call(
        functools.partial(_scan_kernel_bf, gpt_s, gpt_g, tc, True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cat_d, bm), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_s, g_sem_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, g_geo_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_s, Ws), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, Wg), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tc, bm), lambda i, c: (c, i),
                                memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((bm, Ws + Wg), lambda i, c: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t_pad, Bp), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((Bp, Ws + Wg), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((bm, Ws), jnp.float32),
            pltpu.VMEM((bm, Wg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q_t, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw)
    return tuple(o.T for o in out[:4]) + (out[4],)


def main():
    from _tpu_common import standard_fixture
    from range_tpu.ops.retrieval_pallas import pack_queries
    from range_tpu.ops.retrieval_hier import _pad_queries

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

    for SB, TC in ((512, 16), (512, 8), (1024, 16), (256, 16)):
        if q_cat.shape[0] % SB:
            continue
        try:
            ms_a = t(_hier_scan_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                     sem_vw, hb.g_geo_vw, bm=SB, tc=TC, gpt_s=gpt_s,
                     gpt_g=gpt_g)
            ms_b = t(scan_bf_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                     sem_vw, hb.g_geo_vw, bm=SB, tc=TC, gpt_s=gpt_s,
                     gpt_g=gpt_g)
            lap(f"scan bm={SB} tc={TC}: f32exp {ms_a:.2f} ms vs bf16exp "
                f"{ms_b:.2f} ms")
        except Exception as e:
            lap(f"FAIL bm={SB} tc={TC}: {str(e)[:160]}")

    # numeric sanity: stats and tails agree
    a = _hier_scan_call(q_cat, hb.g_sem_cat, hb.g_geo_cat, sem_vw,
                        hb.g_geo_vw, bm=512, tc=16, gpt_s=gpt_s, gpt_g=gpt_g)
    b = scan_bf_call(q_cat, hb.g_sem_cat, hb.g_geo_cat, sem_vw,
                     hb.g_geo_vw, bm=512, tc=16, gpt_s=gpt_s, gpt_g=gpt_g)
    for nm, x, y in zip(("ms", "ss", "mg", "sg", "tail"), a, b):
        x, y = np.asarray(x), np.asarray(y)
        rel = np.abs(x - y) / np.maximum(np.abs(x), 1e-6)
        lap(f"  {nm}: maxrel {rel.max():.4f} meanrel {rel.mean():.6f}")


if __name__ == "__main__":
    main()
