import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Progressive scan-kernel strip-down on real HW: time the kernel with
stages cumulatively enabled (logits-max -> +exp2 -> +mass -> +tail) to
pinpoint where the ~20 us/step actually goes (rooflines don't explain
it; tc=32 miscompiles — 5 corrupt rows — so tc=16 is the grid)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

import range_tpu
from range_tpu.ops.retrieval_hier import (_hier_scan_call, _pad_queries,
                                          CLAMP2)
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


def _kern(gpt_s, gpt_g, tc, lvl, qt_ref, gs_ref, gg_ref, vs_ref, vg_ref,
          ms_ref, ss_ref, mg_ref, sg_ref, tail_ref, accs_ref, accg_ref):
    c0 = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c0 == 0)
    def _():
        accs_ref[:] = jnp.zeros_like(accs_ref)
        accg_ref[:] = jnp.zeros_like(accg_ref)

    qt = qt_ref[:]
    ws = gs_ref.shape[1]
    wg = gg_ref.shape[1]
    sl = jnp.dot(gs_ref[:], qt[:ws], preferred_element_type=jnp.float32)
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    bm_ = sl.shape[1]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    if lvl >= 1:
        es = jnp.exp2(jnp.minimum(sl, CLAMP2))
        eg = jnp.exp2(jnp.minimum(gl, CLAMP2))
    else:
        es, eg = sl, gl
    if lvl >= 2:
        ss_ref[:] = jnp.sum(es.reshape(tc, gpt_s, bm_), axis=1)
        sg_ref[:] = jnp.sum(eg.reshape(tc, gpt_g, bm_), axis=1)
    else:
        ss_ref[:] = ms_ref[:]
        sg_ref[:] = mg_ref[:]
    if lvl >= 3:
        vs = vs_ref[:]
        accs_ref[:] += jax.lax.dot_general(
            es.astype(vs.dtype), vs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vg = vg_ref[:]
        accg_ref[:] += jax.lax.dot_general(
            eg.astype(vg.dtype), vg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c0 == nc - 1)
    def _():
        Ws = accs_ref.shape[1]
        tail_ref[:, :Ws] = accs_ref[:]
        tail_ref[:, Ws:] = accg_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g",
                                             "lvl"))
def call(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *, bm, tc,
         gpt_s, gpt_g, lvl):
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    Ws = g_sem_vw.shape[1]
    Wg = g_geo_vw.shape[1]
    grid = (Bp // bm, t_pad // tc)
    out = pl.pallas_call(
        functools.partial(_kern, gpt_s, gpt_g, tc, lvl),
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
    )(q_cat.T, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw)
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
    sem_vw = hb.g_sem_vw_lr
    args = (q_cat, hb.g_sem_cat, hb.g_geo_cat, sem_vw, hb.g_geo_vw)
    LVL = {0: "logits+max", 1: "+exp2", 2: "+mass-sum", 3: "+tail"}
    for tc in (16,):
        for lvl in (0, 1, 2, 3):
            ms = t(call, *args, bm=512, tc=tc, gpt_s=gpt_s, gpt_g=gpt_g,
                   lvl=lvl)
            lap(f"tc={tc} lvl={lvl} ({LVL[lvl]}): {ms:.2f} ms")
    # prod baseline in the same process
    ms = t(_hier_scan_call, *args, bm=512, tc=16, gpt_s=gpt_s, gpt_g=gpt_g)
    lap(f"prod full tc=16: {ms:.2f} ms")


if __name__ == "__main__":
    main()
