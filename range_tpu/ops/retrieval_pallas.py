"""Fused Pallas TPU kernel for RANGE dual-softmax retrieval.

Computes  out = beta * softmax(ts * q_sem K_semT) V
            + (1-beta) * softmax(tg * q_xyz K_xyzT) V
(`range/range.py:209-238`) in ONE streaming pass over bank tiles.

Design notes (numbers from profiling on v5e):
  * The transcendentals dominate: 2 exps per (query, bank-row) ~= 2e9 exps
    per 10k x 100k call (~8 ms on the VPU) — so the kernel does exactly ONE
    pass (a two-pass blended variant halves the value matmul but doubles the
    exps; measured slower).
  * No online max / logsumexp is needed: the logits are *bounded by the
    temperatures* (|logit| <= temp for unit queries/keys, the reference's
    contract — keys are L2-normalized at bank build, range.py:89), and
    exp(40) ~ 2.4e17 sits comfortably inside f32 — so the kernel accumulates
    *unnormalized* exp sums and divides once at the end.  Logits are clamped
    at 60 as an overflow guard for out-of-contract inputs.
  * The [B, N] logits matrix never exists in HBM.
  * Precision tiers for the logit matmuls — the geo temperature (40) turns
    bf16 input rounding into O(e^{40*eps}) ~ 30% weight errors, so:
      'exact' — f32 operands, HIGHEST-precision passes (parity mode).
      'high'  — DEFAULT: bf16 hi/lo split on queries AND keys with the 3
                cross terms (qh kh + qh kl + ql kh): ~f32-accurate logits at
                full bf16 MXU rate.
      'fast'  — plain bf16 sem logits (~3% weight error at temp 12), hi/lo geo.
    Values may independently be stored bf16 (the weighted average smooths
    value rounding to <1%).

Packed layout (built by `pack_queries` / `pack_bank`): columns [0:S) form the
semantic logit when dotted, columns [S:D) the geo logit; temperatures are
folded into the query side.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LOG2E = 1.4426950408889634
# exp2 is measurably faster than exp on the VPU; log2(e) is folded into the
# packed queries so kernels evaluate exp2 with no extra multiply.
CLAMP2 = 86.0  # 2^86 ~ 7.7e25, still far from f32 overflow even when summed


def _split_hilo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (bf16 hi, bf16 lo) with hi + lo ~= x to ~16 mantissa bits.

    Uses lax.reduce_precision for the rounding: a plain
    ``astype(bf16).astype(f32)`` round-trip is ELIDED by XLA under
    allow-excess-precision, silently zeroing ``lo`` and degrading the split
    to plain bf16."""
    xr = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    hi = xr.astype(jnp.bfloat16)
    lo = (x - xr).astype(jnp.bfloat16)
    return hi, lo


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def packed_dims(key_dim: int, tier: str) -> Tuple[int, int]:
    """(sem_cols, total_cols) for a tier; total is 128-aligned."""
    if tier in ("exact", "fast"):
        sem = key_dim
    elif tier == "high":
        sem = 3 * key_dim
    else:
        raise ValueError(f"unknown precision tier {tier}")
    # geo block: 9 hi/lo cross columns (3 for 'exact'), pad to 128-aligned
    return sem, _round_up(sem + 9, 128)


def pack_queries(q_sem, q_xyz, sem_temp: float, geo_temp: float,
                 tier: str = "exact") -> jnp.ndarray:
    """Packed query matrix; column semantics must match `pack_bank`."""
    B = q_sem.shape[0]
    qs = (sem_temp * LOG2E * q_sem).astype(jnp.float32)
    g = (
        (geo_temp * LOG2E * q_xyz).astype(jnp.float32)
        if q_xyz is not None
        else jnp.zeros((B, 3), jnp.float32)
    )
    sem_d, cat_d = packed_dims(q_sem.shape[1], tier)
    if tier == "exact":
        out = jnp.concatenate([qs, g], axis=1)
        return jnp.pad(out, ((0, 0), (0, cat_d - out.shape[1])))
    gh, gl = _split_hilo(g)
    geo_cols = jnp.concatenate([gh, gh, gl], axis=1)  # pairs with [xh, xl, xh]
    if tier == "high":
        qh, ql = _split_hilo(qs)
        sem_cols = jnp.concatenate([qh, qh, ql], axis=1)
    else:  # fast
        sem_cols = qs.astype(jnp.bfloat16)
    out = jnp.concatenate([sem_cols, geo_cols], axis=1)
    return jnp.pad(out, ((0, 0), (0, cat_d - out.shape[1]))).astype(jnp.bfloat16)


def pack_bank(keys_sem, xyz, tier: str = "exact") -> jnp.ndarray:
    k = keys_sem.astype(jnp.float32)
    x = xyz.astype(jnp.float32)
    sem_d, cat_d = packed_dims(keys_sem.shape[1], tier)
    if tier == "exact":
        out = jnp.concatenate([k, x], axis=1)
        return jnp.pad(out, ((0, 0), (0, cat_d - out.shape[1])))
    xh, xl = _split_hilo(x)
    geo_cols = jnp.concatenate([xh, xl, xh], axis=1)
    if tier == "high":
        kh, kl = _split_hilo(k)
        sem_cols = jnp.concatenate([kh, kl, kh], axis=1)
    else:  # fast
        sem_cols = k.astype(jnp.bfloat16)
    out = jnp.concatenate([sem_cols, geo_cols], axis=1)
    return jnp.pad(out, ((0, 0), (0, cat_d - out.shape[1]))).astype(jnp.bfloat16)


def _fused_kernel(sem_d, beta_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                  acc_ref, ds_ref, dg_ref):
    """Grid (iB, jN), j inner ('arbitrary').  Unnormalized single pass: per
    tile, exp both logit families (bounded, no max tracking needed), fold
    each family's unnormalized weighted sum into its half of one [bm, 2*Dv]
    accumulator, and blend after the final per-family division.  The two
    families need separate normalizers, so the two value matmuls cannot be
    merged — but in the exp-bound regime this single pass still beats a
    stats+apply two-pass design (half the exps)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    q = q_ref[:]
    k = k_ref[:]
    mask = mask_ref[:]  # [1, bn]
    beta = beta_ref[0]

    # f32 operands ('exact' tier) need HIGHEST or Mosaic silently runs a
    # single bf16 MXU pass; bf16 operands must NOT get the fp32 hint
    # (Mosaic rejects it with "Bad lhs type").
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s_logits = (
        jnp.dot(q[:, :sem_d], k[:, :sem_d].T, preferred_element_type=jnp.float32,
                precision=prec)
        + mask
    )
    g_logits = (
        jnp.dot(q[:, sem_d:], k[:, sem_d:].T, preferred_element_type=jnp.float32,
                precision=prec)
        + mask
    )
    p_s = jnp.exp2(jnp.minimum(s_logits, CLAMP2))
    p_g = jnp.exp2(jnp.minimum(g_logits, CLAMP2))
    ds_ref[:] += jnp.sum(p_s, axis=-1, keepdims=True)
    dg_ref[:] += jnp.sum(p_g, axis=-1, keepdims=True)
    Dv = v_ref.shape[1]
    v = v_ref[:]
    vprec = jax.lax.Precision.HIGHEST if v.dtype == jnp.float32 else None
    acc_ref[:, :Dv] += jnp.dot(p_s.astype(v.dtype), v,
                               preferred_element_type=jnp.float32,
                               precision=vprec)
    acc_ref[:, Dv:] += jnp.dot(p_g.astype(v.dtype), v,
                               preferred_element_type=jnp.float32,
                               precision=vprec)

    @pl.when(j == nj - 1)
    def _():
        sem = acc_ref[:, :Dv] / jnp.maximum(ds_ref[:], 1e-30)
        geo = acc_ref[:, Dv:] / jnp.maximum(dg_ref[:], 1e-30)
        out_ref[:] = beta * sem + (1.0 - beta) * geo


def _fused_kernel_i8(sem_d, beta_ref, q_ref, k_ref, v_ref, s_ref, mask_ref,
                     out_ref, acc_ref, ds_ref, dg_ref):
    """_fused_kernel over int8 values with per-row scale s [1, bn].

    sum_j p_j (s_j v_i8_j) = sum_j (p_j s_j) v_i8_j — the dequantization
    scale folds into the probability tile (one VPU multiply), so the value
    matmul runs on the raw int8 block cast to bf16 in VMEM (int8 <= 127 is
    exact in bf16) and the HBM value stream is half the bf16 kernel's.
    Normalizers use the UNscaled probabilities."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    q = q_ref[:]
    k = k_ref[:]
    mask = mask_ref[:]  # [1, bn]
    beta = beta_ref[0]
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s_logits = jnp.dot(q[:, :sem_d], k[:, :sem_d].T,
                       preferred_element_type=jnp.float32, precision=prec) + mask
    g_logits = jnp.dot(q[:, sem_d:], k[:, sem_d:].T,
                       preferred_element_type=jnp.float32, precision=prec) + mask
    p_s = jnp.exp2(jnp.minimum(s_logits, CLAMP2))
    p_g = jnp.exp2(jnp.minimum(g_logits, CLAMP2))
    ds_ref[:] += jnp.sum(p_s, axis=-1, keepdims=True)
    dg_ref[:] += jnp.sum(p_g, axis=-1, keepdims=True)
    Dv = v_ref.shape[1]
    s = s_ref[:]  # [1, bn] f32 dequant scales
    v = v_ref[:].astype(jnp.bfloat16)
    acc_ref[:, :Dv] += jnp.dot((p_s * s).astype(jnp.bfloat16), v,
                               preferred_element_type=jnp.float32)
    acc_ref[:, Dv:] += jnp.dot((p_g * s).astype(jnp.bfloat16), v,
                               preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        sem = acc_ref[:, :Dv] / jnp.maximum(ds_ref[:], 1e-30)
        geo = acc_ref[:, Dv:] / jnp.maximum(dg_ref[:], 1e-30)
        out_ref[:] = beta * sem + (1.0 - beta) * geo


@functools.partial(
    jax.jit, static_argnames=("sem_d", "bm", "bn", "interpret")
)
def retrieve_fused(
    q_cat: jnp.ndarray,
    k_cat: jnp.ndarray,
    values: jnp.ndarray,
    mask_neg: jnp.ndarray,
    beta: jnp.ndarray,
    scale: jnp.ndarray = None,
    *,
    sem_d: int,
    bm: int = 256,
    bn: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-pass retrieval over packed operands.

    Args:
      q_cat: [B, D] packed queries (pack_queries).
      k_cat: [N, D] packed keys (pack_bank); N must be a multiple of bn.
      values: [N, Dv]; int8 when `scale` is given.
      mask_neg: [1, N] additive logits mask (0 valid / -1e30 pad).
      beta: scalar f32 blend weight (beta=1 => pure semantic path = RANGE).
      scale: optional [1, N] f32 per-row value dequantization scales
        (bank.quantize_values) — selects the int8-value kernel.
      sem_d: column split between the semantic and geo logit groups.
    Returns: [B, Dv] f32.
    """
    B, cat_d = q_cat.shape
    N, Dv = values.shape
    assert k_cat.shape == (N, cat_d), (k_cat.shape, cat_d)
    Bp = _round_up(B, bm)
    if Bp != B:
        q_cat = jnp.pad(q_cat, ((0, Bp - B), (0, 0)))
    assert N % bn == 0, (N, bn)
    grid = (Bp // bm, N // bn)

    q_spec = pl.BlockSpec((bm, cat_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((bn, cat_d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    v_spec = pl.BlockSpec((bn, Dv), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # beta [1]
        q_spec,
        k_spec,
        v_spec,
    ]
    operands = [jnp.asarray([beta], jnp.float32).reshape(1), q_cat, k_cat,
                values]
    if scale is None:
        kernel = functools.partial(_fused_kernel, sem_d)
    else:
        kernel = functools.partial(_fused_kernel_i8, sem_d)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(scale.astype(jnp.float32))
    in_specs.append(m_spec)
    operands.append(mask_neg)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, Dv), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Dv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, 2 * Dv), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * (cat_d + 2 * Dv),
            bytes_accessed=N * (cat_d + Dv) * values.dtype.itemsize
            + Bp * (cat_d + Dv) * 4,
            transcendentals=2 * Bp * N,
        ),
        interpret=interpret,
    )(*operands)

    return out[:B]


def _fused_parts_kernel(sem_d, has_scale, q_ref, k_ref, v_ref, *rest):
    """Like _fused_kernel but emits UNNORMALIZED partials for cross-shard
    combination: out[:, :2*Dv] = [sem_acc | geo_acc], out[:, 2*Dv] = d_sem,
    out[:, 2*Dv + 1] = d_geo.  Because the exp sums are unnormalized (bounded
    logits — see module docstring), per-shard partials combine with a plain
    psum, no logsumexp algebra needed (parallel/sharded.py).  With
    `has_scale` the values are raw int8 blocks and s [1, bn] f32 dequant
    scales fold into the probabilities (the _fused_kernel_i8 trick), so
    sharded serving streams int8 natively at half the value bytes."""
    if has_scale:
        s_ref, mask_ref, out_ref, acc_ref, ds_ref, dg_ref = rest
    else:
        mask_ref, out_ref, acc_ref, ds_ref, dg_ref = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    q = q_ref[:]
    k = k_ref[:]
    mask = mask_ref[:]
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s_logits = (
        jnp.dot(q[:, :sem_d], k[:, :sem_d].T, preferred_element_type=jnp.float32,
                precision=prec)
        + mask
    )
    g_logits = (
        jnp.dot(q[:, sem_d:], k[:, sem_d:].T, preferred_element_type=jnp.float32,
                precision=prec)
        + mask
    )
    p_s = jnp.exp2(jnp.minimum(s_logits, CLAMP2))
    p_g = jnp.exp2(jnp.minimum(g_logits, CLAMP2))
    ds_ref[:] += jnp.sum(p_s, axis=-1, keepdims=True)
    dg_ref[:] += jnp.sum(p_g, axis=-1, keepdims=True)
    Dv = v_ref.shape[1]
    if has_scale:
        s = s_ref[:]  # [1, bn] f32; normalizers stay UNscaled
        v = v_ref[:].astype(jnp.bfloat16)
        acc_ref[:, :Dv] += jnp.dot((p_s * s).astype(jnp.bfloat16), v,
                                   preferred_element_type=jnp.float32)
        acc_ref[:, Dv:] += jnp.dot((p_g * s).astype(jnp.bfloat16), v,
                                   preferred_element_type=jnp.float32)
    else:
        v = v_ref[:]
        vprec = jax.lax.Precision.HIGHEST if v.dtype == jnp.float32 else None
        acc_ref[:, :Dv] += jnp.dot(p_s.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32,
                                   precision=vprec)
        acc_ref[:, Dv:] += jnp.dot(p_g.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32,
                                   precision=vprec)

    @pl.when(j == nj - 1)
    def _():
        Dv2 = 2 * v_ref.shape[1]
        out_ref[:, :Dv2] = acc_ref[:]
        out_ref[:, Dv2:Dv2 + 1] = ds_ref[:]
        out_ref[:, Dv2 + 1:Dv2 + 2] = dg_ref[:]
        out_ref[:, Dv2 + 2:] = jnp.zeros_like(out_ref[:, Dv2 + 2:])


@functools.partial(jax.jit, static_argnames=("sem_d", "bm", "bn", "interpret"))
def retrieve_fused_parts(
    q_cat: jnp.ndarray,
    k_cat: jnp.ndarray,
    values: jnp.ndarray,
    mask_neg: jnp.ndarray,
    scale: jnp.ndarray = None,
    *,
    sem_d: int,
    bm: int = 256,
    bn: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unnormalized fused retrieval partials: [B, 2*Dv + 128] with
    [sem_acc | geo_acc | d_sem | d_geo | pad].  Sums linearly across bank
    shards — the multi-chip building block.  Pass int8 `values` + f32
    `scale` [1, N] to stream the quantized bank natively (half the value
    bytes; the scale folds into the probabilities in-kernel)."""
    B, cat_d = q_cat.shape
    N, Dv = values.shape
    Bp = _round_up(B, bm)
    if Bp != B:
        q_cat = jnp.pad(q_cat, ((0, Bp - B), (0, 0)))
    assert N % bn == 0, (N, bn)
    grid = (Bp // bm, N // bn)
    q_spec = pl.BlockSpec((bm, cat_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((bn, cat_d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    has_scale = scale is not None
    in_specs = [q_spec, k_spec,
                pl.BlockSpec((bn, Dv), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)]
    operands = [q_cat, k_cat, values]
    if has_scale:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(scale.astype(jnp.float32))
    in_specs.append(m_spec)
    operands.append(mask_neg)
    out_w = 2 * Dv + 128
    out = pl.pallas_call(
        functools.partial(_fused_parts_kernel, sem_d, has_scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_w), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, 2 * Dv), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:B]


def _family_pruned_kernel(has_scale, idx_ref, cnt_ref, q_ref, k_ref, v_ref,
                          *rest):
    """One-family pruned softmax-weighted sum.  Grid (iB, g) where g walks
    the query-tile's *active-first* bank-tile list (scalar-prefetched
    idx/counts from bank/clustered.compute_tile_plan).  For g >= count the
    index map repeats the last active tile — the pipeline serves it without
    a new DMA and the body skips all compute.  With `has_scale` the values
    stream as raw int8 + per-row f32 scales folded into the probabilities
    (the _fused_kernel_i8 trick)."""
    if has_scale:
        s_ref, mask_ref, out_ref, acc_ref, d_ref = rest
    else:
        mask_ref, out_ref, acc_ref, d_ref = rest
    i = pl.program_id(0)
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    active = g < cnt_ref[i]

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    @pl.when(active)
    def _():
        q = q_ref[:]
        k = k_ref[:]
        prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
        logits = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=prec)
            + mask_ref[:]
        )
        p = jnp.exp2(jnp.minimum(logits, CLAMP2))
        d_ref[:] += jnp.sum(p, axis=-1, keepdims=True)
        if has_scale:
            v = v_ref[:].astype(jnp.bfloat16)
            acc_ref[:] += jnp.dot((p * s_ref[:]).astype(jnp.bfloat16), v,
                                  preferred_element_type=jnp.float32)
        else:
            v = v_ref[:]
            vprec = (jax.lax.Precision.HIGHEST if v.dtype == jnp.float32
                     else None)
            acc_ref[:] += jnp.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32,
                                  precision=vprec)

    @pl.when(g == ng - 1)
    def _():
        out_ref[:] = acc_ref[:] / jnp.maximum(d_ref[:], 1e-30)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _family_pruned_call(q_fam, k_fam, values, mask_neg, tile_idx, tile_counts,
                        scale=None, *, bm: int, bn: int,
                        interpret: bool = False):
    """q_fam [B, C] x k_fam [N, C] -> softmax-weighted values [B, Dv], visiting
    only the active tiles of each query tile.  int8 `values` + f32 `scale`
    [1, N] stream the quantized bank natively."""
    B, C = q_fam.shape
    N, Dv = values.shape
    Bp = _round_up(B, bm)
    if Bp != B:
        q_fam = jnp.pad(q_fam, ((0, Bp - B), (0, 0)))
    T = N // bn
    assert tile_idx.shape == (Bp // bm, T), (tile_idx.shape, (Bp // bm, T))

    has_scale = scale is not None
    in_specs = [
        pl.BlockSpec((bm, C), lambda i, g, idx, cnt: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, C), lambda i, g, idx, cnt: (idx[i, g], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, Dv), lambda i, g, idx, cnt: (idx[i, g], 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q_fam, k_fam, values]
    if has_scale:
        in_specs.append(pl.BlockSpec((1, bn),
                                     lambda i, g, idx, cnt: (0, idx[i, g]),
                                     memory_space=pltpu.VMEM))
        operands.append(scale.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, bn), lambda i, g, idx, cnt: (0, idx[i, g]),
                                 memory_space=pltpu.VMEM))
    operands.append(mask_neg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // bm, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, Dv), lambda i, g, idx, cnt: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, Dv), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_family_pruned_kernel, has_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tile_idx, tile_counts, *operands)
    return out[:B]


def retrieve_pruned(q_sem, q_xyz, bank, stats, *, sem_temp=12.0, geo_temp=40.0,
                    beta=0.5, mode="range+", tier: str = "fast",
                    bm: int = 256, bn: int = 1024, margin: float = 20.0,
                    sort_queries: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Pruned retrieval over a clustered bank (bank/clustered.cluster_bank):
    each logit family runs its own pruned pass with its own tile plan (the
    geo family at temp 40 prunes hard under spatial ordering; sem prunes to
    the extent the keys are spatially autocorrelated).  Dropped tiles
    contribute < N*e^{-margin} relative softmax mass per family.

    `sort_queries` orders the batch geographically first (and restores the
    original order after): the keep decision is per QUERY-TILE (an OR over
    its bm queries), so spatially coherent query tiles are what make the
    per-query pruning survive aggregation.

    When to use (measured on v5e): the dense fused kernel is near the
    machine floor (exp throughput + two value matmuls), and splitting
    families doubles the value-stream DMA — so this path only wins when BOTH
    families prune substantially (regional query batches against a bank
    whose keys are spatially autocorrelated).  At temp 12 the semantic
    softmax is near-global on weakly-clustered keys; benchmark your bank."""
    from ..bank.clustered import compute_tile_plan

    if mode == "range":
        q_xyz = None
        beta = 1.0

    inv = None
    if sort_queries and q_xyz is not None:
        from ..geometry import geo_sort_order

        order = geo_sort_order(q_xyz)
        inv = jnp.argsort(order)
        q_sem = q_sem[order]
        q_xyz = q_xyz[order]
    q_cat = pack_queries(q_sem, q_xyz, sem_temp, geo_temp, tier=tier)
    k_cat = pack_bank(bank.keys_sem, bank.xyz, tier=tier)
    sem_d, cat_d = packed_dims(bank.keys_sem.shape[1], tier)
    mask_neg = (NEG * (1.0 - bank.row_mask()))[None, :].astype(jnp.float32)
    if stats.sem_radius.shape[0] != bank.num_rows // bn:
        raise ValueError(
            f"tile stats built for {stats.sem_radius.shape[0]} tiles but "
            f"bn={bn} gives {bank.num_rows // bn}; rebuild via cluster_bank "
            f"with matching bn")

    if getattr(bank, "value_scale", None) is not None:
        # int8 banks stream natively (scale folds into the probabilities)
        values, scale = bank.values, bank.value_scale
    else:
        values, scale = _serving_values(bank.values, interpret), None
    idx_s, cnt_s = compute_tile_plan(
        q_sem, stats.sem_centroid, stats.sem_radius, temp=sem_temp, bm=bm,
        margin=margin)
    sem = _family_pruned_call(q_cat[:, :sem_d], k_cat[:, :sem_d], values,
                              mask_neg, idx_s, cnt_s, scale, bm=bm, bn=bn,
                              interpret=interpret)
    if mode == "range":
        return sem
    idx_g, cnt_g = compute_tile_plan(
        q_xyz, stats.geo_centroid, stats.geo_radius, temp=geo_temp, bm=bm,
        margin=margin)
    geo = _family_pruned_call(q_cat[:, sem_d:], k_cat[:, sem_d:], values,
                              mask_neg, idx_g, cnt_g, scale, bm=bm, bn=bn,
                              interpret=interpret)
    out = beta * sem + (1.0 - beta) * geo
    if inv is not None:
        out = out[inv]
    return out


def _bank_serving_values(bank, interpret: bool) -> jnp.ndarray:
    """_serving_values over a GeoBank: int8-quantized banks are dequantized
    to bf16 here (only the hybrid kernel still lacks a scale input; the
    fused/parts/pruned kernels stream int8 natively)."""
    if getattr(bank, "value_scale", None) is not None:
        return (bank.values.astype(jnp.float32)
                * bank.value_scale.T).astype(jnp.bfloat16)
    return _serving_values(bank.values, interpret)


def _serving_values(values: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """The compiled kernel always runs bf16 values: f32 value blocks do not
    fit VMEM at any useful block size (measured: every f32 config OOMs at
    19-33 MB scoped vs the 16 MB limit), and the weighted average smooths
    bf16 value rounding to <1% (test_fused_bf16_values_close).  Interpret
    mode (CPU parity tests) keeps the stored dtype; f32-exact serving goes
    through ops/retrieval.retrieve."""
    if interpret or values.dtype == jnp.bfloat16:
        return values
    return values.astype(jnp.bfloat16)


def _pick_bn(bn: int, bm: int, cat_d: int, Dv: int, k_item: int, v_item: int,
             n_rows: int, budget: int = 13 * 2**20) -> int:
    """Largest bn <= requested that fits the VMEM budget and divides n_rows.
    Mosaic double-buffers ALL streamed blocks (k, v, q, out), measured
    against actual scoped-vmem OOM reports."""
    while bn > 128:
        need = (
            2 * bn * (cat_d * k_item + Dv * v_item)  # k/v blocks, double-buffered
            + 2 * bm * cat_d * k_item                # query block, double-buffered
            + 2 * bm * Dv * 4                        # out block, double-buffered
            + bm * (2 * Dv + 2) * 4                  # accumulator + denominators
            + 2 * bm * bn * 4                        # p_s / p_g tiles
        )
        if need <= budget and n_rows % bn == 0:
            return bn
        bn //= 2
    return bn


def _hybrid_kernel(sem_d, flag_ref, beta_ref, q_ref, k_ref, v_ref, mask_ref,
                   out_ref, acc_ref, ds_ref, dg_ref):
    """Dense semantic path + tile-flagged geo path.  Same grid/DMA as
    _fused_kernel (K/V stream regardless — the sem family needs them), but
    the geo logits/exp/value-matmul are skipped where the scalar-prefetched
    flag[i, j] is 0 (tile provably negligible for the geo softmax)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    q = q_ref[:]
    k = k_ref[:]
    mask = mask_ref[:]
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    Dv = v_ref.shape[1]
    v = v_ref[:]
    vprec = jax.lax.Precision.HIGHEST if v.dtype == jnp.float32 else None

    s_logits = (
        jnp.dot(q[:, :sem_d], k[:, :sem_d].T, preferred_element_type=jnp.float32,
                precision=prec)
        + mask
    )
    p_s = jnp.exp2(jnp.minimum(s_logits, CLAMP2))
    ds_ref[:] += jnp.sum(p_s, axis=-1, keepdims=True)
    acc_ref[:, :Dv] += jnp.dot(p_s.astype(v.dtype), v,
                               preferred_element_type=jnp.float32,
                               precision=vprec)

    @pl.when(flag_ref[i, j] > 0)
    def _():
        g_logits = (
            jnp.dot(q[:, sem_d:], k[:, sem_d:].T,
                    preferred_element_type=jnp.float32, precision=prec)
            + mask
        )
        p_g = jnp.exp2(jnp.minimum(g_logits, CLAMP2))
        dg_ref[:] += jnp.sum(p_g, axis=-1, keepdims=True)
        acc_ref[:, Dv:] += jnp.dot(p_g.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32,
                                   precision=vprec)

    @pl.when(j == nj - 1)
    def _():
        beta = beta_ref[0]
        sem = acc_ref[:, :Dv] / jnp.maximum(ds_ref[:], 1e-30)
        geo = acc_ref[:, Dv:] / jnp.maximum(dg_ref[:], 1e-30)
        out_ref[:] = beta * sem + (1.0 - beta) * geo


@functools.partial(jax.jit, static_argnames=("sem_d", "bm", "bn", "interpret"))
def retrieve_fused_hybrid(q_cat, k_cat, values, mask_neg, beta, geo_flags, *,
                          sem_d: int, bm: int = 256, bn: int = 1024,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused retrieval with geo compute gated per (query-tile, bank-tile) by
    `geo_flags` [nB, T] int32 from bank/clustered.compute_keep_mask."""
    B, cat_d = q_cat.shape
    N, Dv = values.shape
    Bp = _round_up(B, bm)
    if Bp != B:
        q_cat = jnp.pad(q_cat, ((0, Bp - B), (0, 0)))
    assert N % bn == 0
    T = N // bn
    assert geo_flags.shape == (Bp // bm, T), (geo_flags.shape, (Bp // bm, T))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // bm, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta
            pl.BlockSpec((bm, cat_d), lambda i, j, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, cat_d), lambda i, j, f: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Dv), lambda i, j, f: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, f: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, Dv), lambda i, j, f: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, 2 * Dv), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hybrid_kernel, sem_d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(geo_flags, jnp.asarray([beta], jnp.float32).reshape(1), q_cat, k_cat,
      values, mask_neg)
    return out[:B]


def retrieve_hybrid(q_sem, q_xyz, bank, stats, *, sem_temp=12.0, geo_temp=40.0,
                    beta=0.5, tier: str = "fast", bm: int = 256,
                    bn: int = 1024, margin: float = 20.0,
                    sort_queries: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Dense sem + geo-pruned fused retrieval over a clustered bank: unlike
    `retrieve_pruned`, the K/V stream is shared between families (no
    duplicate DMA).

    Measured on v5e: despite skipping 37% of geo tiles, the per-tile
    conditional costs more than it saves (Mosaic schedules the conditional
    branch conservatively, breaking matmul/DMA overlap) — 54 ms vs the dense
    kernel's 41 ms on the regional-batch benchmark.  Kept as the structural
    template for hardware/compilers where predicated tiles are free;
    production uses the dense kernel."""
    from ..bank.clustered import compute_keep_mask

    inv = None
    if sort_queries:
        from ..geometry import geo_sort_order

        order = geo_sort_order(q_xyz)
        inv = jnp.argsort(order)
        q_sem = q_sem[order]
        q_xyz = q_xyz[order]
    q_cat = pack_queries(q_sem, q_xyz, sem_temp, geo_temp, tier=tier)
    k_cat = pack_bank(bank.keys_sem, bank.xyz, tier=tier)
    sem_d, cat_d = packed_dims(bank.keys_sem.shape[1], tier)
    mask_neg = (NEG * (1.0 - bank.row_mask()))[None, :].astype(jnp.float32)
    if stats.geo_radius.shape[0] != bank.num_rows // bn:
        raise ValueError("tile stats tile count mismatch; rebuild cluster_bank")
    flags = compute_keep_mask(q_xyz, stats.geo_centroid, stats.geo_radius,
                              temp=geo_temp, bm=bm, margin=margin
                              ).astype(jnp.int32)
    out = retrieve_fused_hybrid(q_cat, k_cat,
                                _bank_serving_values(bank, interpret),
                                mask_neg, jnp.float32(beta), flags,
                                sem_d=sem_d, bm=bm, bn=bn, interpret=interpret)
    if inv is not None:
        out = out[inv]
    return out


def retrieve_pallas(q_sem, q_xyz, bank, *, sem_temp=12.0, geo_temp=40.0,
                    beta=0.5, mode="range+", tier: str = "fast",
                    bm: int = 256, bn: int = 1024, pick_bn: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused equivalent of `ops.retrieval.retrieve` (same semantics;
    see module docstring for the precision tiers).  Banks prepared with
    `bank.quantize_values` (int8 values + per-row scale) automatically take
    the half-bandwidth int8-value kernel.

    `pick_bn=True` clamps bn with the conservative analytic VMEM model
    (_pick_bn); `pick_bn=False` hands the requested shape straight to
    Mosaic — the autotuner uses this so the COMPILER's own scoped-vmem
    check, not the hand model, is the feasibility oracle."""
    if mode == "range":
        beta = 1.0
        q_xyz = None
    q_cat = pack_queries(q_sem, q_xyz, sem_temp, geo_temp, tier=tier)
    k_cat = pack_bank(bank.keys_sem, bank.xyz, tier=tier)
    sem_d, cat_d = packed_dims(bank.keys_sem.shape[1], tier)
    mask_neg = (NEG * (1.0 - bank.row_mask()))[None, :].astype(jnp.float32)
    scale = getattr(bank, "value_scale", None)
    if scale is None:
        values = _serving_values(bank.values, interpret)
        # int8 streams half the bytes but materializes a bf16 cast temp in
        # VMEM — net block footprint matches bf16, so the same bn fits.
        v_item = values.dtype.itemsize
    else:
        values = bank.values  # int8, streamed raw
        v_item = 2
    if pick_bn:
        bn = _pick_bn(bn, bm, cat_d, bank.value_dim, k_cat.dtype.itemsize,
                      v_item, bank.num_rows)
    return retrieve_fused(q_cat, k_cat, values, mask_neg,
                          jnp.float32(beta), scale, sem_d=sem_d, bm=bm, bn=bn,
                          interpret=interpret)
