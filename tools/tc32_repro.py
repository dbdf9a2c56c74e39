"""Minimal standalone repro: Mosaic silently corrupts a fused Pallas scan
kernel at tc=32 row-blocks on TPU v5e (compiles cleanly; output rows are
wrong).  No range_tpu imports — this file is self-contained for an upstream
issue (see tools/ISSUE_tc32.md for the writeup).

The kernel is a 2-D-grid scan: grid (B/bm, T/tc), inner dim 'arbitrary'.
Per step it computes two [tc*gpt, bm] logit matmuls from bf16 operands,
exp2s them, emits per-tile segment max/sum stats via a reshape([tc, gpt,
bm]) reduction, and accumulates a [bm, W] tail matmul in VMEM scratch that
is written on the last step.  With tc=16 the kernel matches interpret mode
(pure-XLA lowering of the same blocks) to fp noise on every trial; with
tc=32 a handful of output rows deviate by up to ~0.26 maxrel — same HLO
semantics, only the block shape differs, so tc must not change results.

Observed on: TPU v5 lite (v5e), single chip, jax/jaxlib 0.8.x, Pallas
Mosaic backend, 2026-08.  Deterministic enough to hit within a few trials
at bm=256 and bm=512 (production geometry: gpt_s=32, gpt_g=8, T=224).

Usage (on a TPU host):   python tools/tc32_repro.py [--trials 8]
Exit 1 if tc=32 deviates from tc=16/interpret beyond 1e-2 maxrel.
"""
import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLAMP2 = 120.0  # exp2 clamp (finite logits by construction)


def scan_kernel(gpt_s, gpt_g, tc, qt_ref, gs_ref, gg_ref, vs_ref, vg_ref,
                ms_ref, ss_ref, mg_ref, sg_ref, tail_ref, accs_ref,
                accg_ref):
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
    bm_ = sl.shape[1]
    # per-tile segment reductions: [tc*gpt, bm] -> [tc, gpt, bm] -> [tc, bm]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    ss_ref[:] = jnp.sum(es.reshape(tc, gpt_s, bm_), axis=1)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    sg_ref[:] = jnp.sum(eg.reshape(tc, gpt_g, bm_), axis=1)
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


@functools.partial(jax.jit,
                   static_argnames=("bm", "tc", "gpt_s", "gpt_g",
                                    "interpret"))
def scan_call(q_t, gs, gg, vs, vg, *, bm, tc, gpt_s, gpt_g,
              interpret=False):
    cat_d, Bp = q_t.shape
    t_pad = gs.shape[0] // gpt_s
    Ws, Wg = vs.shape[1], vg.shape[1]
    grid = (Bp // bm, t_pad // tc)
    return pl.pallas_call(
        functools.partial(scan_kernel, gpt_s, gpt_g, tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cat_d, bm), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_s, gs.shape[1]), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, gg.shape[1]), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((bm, Ws), jnp.float32),
                        pltpu.VMEM((bm, Wg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q_t, gs, gg, vs, vg)


def make_operands(seed, B=10_240, T=224, cat_d=384, sem_d=256, gpt_s=32,
                  gpt_g=8, Ws=384, Wg=1152):
    """Random operands with the production geometry's shapes/dtypes and
    bounded logits (unit-ish rows times temperature ~17 in exp2 units)."""
    rng = np.random.default_rng(seed)

    def unit(n, d):
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    qt = np.zeros((cat_d, B), np.float32)
    qt[:sem_d] = (17.3 * unit(B, sem_d)).T
    qt[sem_d:sem_d + 9] = (57.7 * unit(B, 9)).T
    gs = np.zeros((T * gpt_s, sem_d), np.float32)
    gs[:] = unit(T * gpt_s, sem_d)
    gg = np.zeros((T * gpt_g, cat_d - sem_d), np.float32)
    gg[:, :9] = unit(T * gpt_g, 9)
    vs = rng.standard_normal((T * gpt_s, Ws)).astype(np.float32)
    vg = rng.standard_normal((T * gpt_g, Wg)).astype(np.float32)
    return (jnp.asarray(qt, jnp.bfloat16), jnp.asarray(gs, jnp.bfloat16),
            jnp.asarray(gg, jnp.bfloat16), jnp.asarray(vs, jnp.bfloat16),
            jnp.asarray(vg, jnp.bfloat16))


def maxrel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float((np.abs(a - b) / np.maximum(np.abs(b), 1e-1)).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--bm", type=int, default=256)
    ap.add_argument("--tol", type=float, default=1e-2)
    args = ap.parse_args()
    print("device:", jax.devices()[0])

    worst = 0.0
    bad_trials = 0
    for trial in range(args.trials):
        ops = make_operands(trial)
        kw = dict(bm=args.bm, gpt_s=32, gpt_g=8)
        ref = [np.asarray(o) for o in scan_call(*ops, tc=16, **kw)]
        out = [np.asarray(o) for o in scan_call(*ops, tc=32, **kw)]
        rels = [maxrel(o, r) for o, r in zip(out, ref)]
        names = ["max_sem", "sum_sem", "max_geo", "sum_geo", "tail"]
        w = max(rels)
        worst = max(worst, w)
        flag = "  <-- CORRUPT" if w > args.tol else ""
        print(f"trial {trial}: tc=32 vs tc=16 maxrel "
              + " ".join(f"{n}={r:.3g}" for n, r in zip(names, rels))
              + flag)
        if w > args.tol:
            bad_trials += 1
            # corroborate against the Mosaic-free interpret lowering
            gold = [np.asarray(o)
                    for o in scan_call(*ops, tc=16, interpret=True, **kw)]
            r16 = max(maxrel(r, g) for r, g in zip(ref, gold))
            r32 = max(maxrel(o, g) for o, g in zip(out, gold))
            print(f"  vs interpret oracle: tc=16 maxrel {r16:.3g}, "
                  f"tc=32 maxrel {r32:.3g}")
    print(f"\n{bad_trials}/{args.trials} trials corrupt at tc=32 "
          f"(worst maxrel {worst:.3g}, tol {args.tol})")
    sys.exit(1 if bad_trials else 0)


if __name__ == "__main__":
    main()
