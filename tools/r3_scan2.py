import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Scan-stage dissection: 4.36 ms standalone at ~27% MFU is now the
dominant e2e cost (r3_expbf).  Times the production scan vs stats-only
(no tail matmuls) vs a tail-only copy (no stat reductions/writes) and a
no-transpose return, across (bm, tc) grids — to localize whether MXU
scheduling, the VPU stat chain, the scratch accumulate, or the XLA
transposes eat the time."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

import range_tpu
from range_tpu.ops.retrieval_hier import (_hier_scan_call,
                                          _hier_scan_stats_call,
                                          _pad_queries, CLAMP2)
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


def _tail_only_kernel(gpt_s, gpt_g, tc, qt_ref, gs_ref, gg_ref,
                      vs_ref, vg_ref, tail_ref, accs_ref, accg_ref):
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
    es = jnp.exp2(jnp.minimum(sl, CLAMP2))
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    eg = jnp.exp2(jnp.minimum(gl, CLAMP2))
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


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g"))
def tail_only_call(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
                   bm, tc, gpt_s, gpt_g):
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    Ws = g_sem_vw.shape[1]
    Wg = g_geo_vw.shape[1]
    grid = (Bp // bm, t_pad // tc)
    out = pl.pallas_call(
        functools.partial(_tail_only_kernel, gpt_s, gpt_g, tc),
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
        out_specs=pl.BlockSpec((bm, Ws + Wg), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Ws + Wg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, Ws), jnp.float32),
            pltpu.VMEM((bm, Wg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q_cat.T, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw)
    return out


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g"))
def scan_no_t(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
              bm, tc, gpt_s, gpt_g):
    """Production scan WITHOUT the 4 stat transposes back to [Bp, t_pad]."""
    out = _hier_scan_call.__wrapped__(
        q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, bm=bm, tc=tc,
        gpt_s=gpt_s, gpt_g=gpt_g)
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

    for SB, TC in ((512, 16), (512, 28), (512, 32), (1024, 8), (256, 28)):
        if q_cat.shape[0] % SB or hb.t_pad % TC:
            continue
        for name, fn in (("full", _hier_scan_call),
                         ("stats", _hier_scan_stats_call),
                         ("tail", tail_only_call)):
            try:
                if name == "stats":
                    ms = t(fn, *args[:3], bm=SB, tc=TC, gpt_s=gpt_s,
                           gpt_g=gpt_g)
                else:
                    ms = t(fn, *args, bm=SB, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)
                lap(f"bm={SB} tc={TC} {name}: {ms:.2f} ms")
            except Exception as e:
                lap(f"FAIL bm={SB} tc={TC} {name}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
