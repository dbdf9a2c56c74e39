"""Vectorized real spherical-harmonics basis for TPU.

The reference evaluates spherical harmonics with a Python double loop over
(l, m) doing one tiny tensor op per basis function
(`range/location_models/satclip/positional_encoding/spherical_harmonics.py:34-42`)
— 1600 dispatches per batch at L=40.  Here the whole [B, L*L] basis is built
from a *fully-normalized* associated-Legendre recurrence unrolled at trace
time, so XLA fuses it into a handful of VPU kernels, plus one matmul-friendly
layout.  No Python-level work happens per call after jit.

Two conventions are supported, matching the two reference code paths bit-for-bit
(up to float error):

* ``analytic`` — semantics of the sympy-generated table
  (`spherical_harmonics_generate_ylms.py:19-35`).  Note two quirks of that
  generator which we reproduce because the released SatCLIP checkpoints were
  trained against it:
    - the ``m == 0`` branch computes ``sqrt((2l+1)/4*pi)`` which is
      ``sqrt((2l+1)*pi)/2`` — i.e. **pi times** the orthonormal constant;
    - the explicit ``(-1)**m`` factor cancels the Condon–Shortley phase baked
      into sympy's ``assoc_legendre``, so m != 0 terms carry **no** net CS
      phase.
* ``closed-form`` — semantics of
  `spherical_harmonics_closed_form.py:8-40`: orthonormal constants, with the
  Condon–Shortley phase retained in P_l^m (so m != 0 terms flip sign for odd m
  relative to ``analytic``).

Input convention matches `spherical_harmonics.py:27-32`:
``phi = deg2rad(lon + 180)`` in [0, 2pi], ``theta = deg2rad(lat + 90)`` in
[0, pi], and the basis is stacked in (l, m) order: l = 0..L-1, m = -l..l.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def normalized_legendre(x: jnp.ndarray, s: jnp.ndarray, L: int) -> dict:
    """Fully-normalized associated Legendre functions Pbar_l^m(x) for all
    0 <= m <= l < L, evaluated with the standard stable three-term recurrence
    (normalization folded into the recurrence so intermediates stay O(sqrt(l))
    — safe in float32 even at L=100, unlike the raw recurrence in the
    reference closed-form file which overflows float32 near l=30).

    Pbar is defined WITHOUT the Condon–Shortley phase and such that
    Y_l^m = Pbar_l^m(cos theta) * [sqrt(2) cos(m phi) | 1 | sqrt(2) sin(|m| phi)]
    is orthonormal on the sphere.

    Args:
      x: cos(theta), any shape.
      s: sin(theta) (>= 0 on [0, pi]), same shape.
      L: number of degrees.
    Returns:
      dict {(l, m): array} with Pbar values.
    """
    P = {}
    # Pbar_0^0 = 1/sqrt(4 pi)
    P[(0, 0)] = jnp.full_like(x, 1.0 / math.sqrt(4 * math.pi))
    # diagonal: Pbar_m^m = s * sqrt((2m+1)/(2m)) * Pbar_{m-1}^{m-1}
    for m in range(1, L):
        P[(m, m)] = P[(m - 1, m - 1)] * s * math.sqrt((2 * m + 1) / (2 * m))
    # first off-diagonal: Pbar_{m+1}^m = sqrt(2m+3) * x * Pbar_m^m
    for m in range(0, L - 1):
        P[(m + 1, m)] = math.sqrt(2 * m + 3) * x * P[(m, m)]
    # upward recurrence in l
    for m in range(0, L):
        for l in range(m + 2, L):
            a = math.sqrt((4 * l * l - 1) / (l * l - m * m))
            b = math.sqrt(((l - 1) ** 2 - m * m) / (4 * (l - 1) ** 2 - 1))
            P[(l, m)] = a * (x * P[(l - 1, m)] - b * P[(l - 2, m)])
    return P


def spherical_harmonics_basis_looped(
    lonlat_deg: jnp.ndarray, L: int, convention: str = "analytic"
) -> jnp.ndarray:
    """Reference implementation: explicit per-(l,m) columns from the dict
    recurrence.  O(L^2) traced ops — kept for testing the fast path below."""
    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)

    x = jnp.cos(theta)
    s = jnp.sin(theta)
    P = normalized_legendre(x, s, L)

    # cos(m phi), sin(m phi) for all m at once: [B, L]
    m_arr = jnp.arange(L, dtype=phi.dtype)
    ang = phi[..., None] * m_arr
    cos_m = jnp.cos(ang)
    sin_m = jnp.sin(ang)

    sqrt2 = math.sqrt(2.0)
    cols = []
    for l in range(L):
        for m in range(-l, l + 1):
            am = abs(m)
            if convention == "analytic":
                # net CS phase cancelled by the generator's (-1)**m
                sign = 1.0
                m0_scale = math.pi  # sqrt((2l+1)/4*pi) == pi * sqrt((2l+1)/(4pi))
            else:
                sign = (-1.0) ** am  # CS phase inside P_l^m
                m0_scale = 1.0
            if m == 0:
                cols.append(m0_scale * P[(l, 0)])
            elif m > 0:
                cols.append(sign * sqrt2 * P[(l, m)] * cos_m[..., m])
            else:
                cols.append(sign * sqrt2 * P[(l, am)] * sin_m[..., am])
    return jnp.stack(cols, axis=-1)


@functools.lru_cache(maxsize=16)
def _sh_plan(L: int, convention: str):
    """Static (numpy) coefficient tables for the vectorized evaluation.

    The recurrence is iterated over the diagonal offset k = l - m, all m
    columns in parallel: P[k] is the [M] vector (Pbar_{m+k, m})_m.  That
    turns the O(L^2) per-(l,m) op graph into O(L) ops on [B, L] tensors —
    ~40x smaller XLA graph at SatCLIP's L=40 (compile went from ~77 s to a
    few seconds on the v5e tunnel).
    """
    ms = np.arange(L, dtype=np.float64)
    # diag constants d_m: Pbar_mm = d_m * s^m
    d = np.full(L, 1.0 / math.sqrt(4 * math.pi))
    for m in range(1, L):
        d[m] = d[m - 1] * math.sqrt((2 * m + 1) / (2 * m))
    # off-diag: Pbar_{m+1,m} = e_m * x * Pbar_mm
    e = np.sqrt(2 * ms + 3)
    # general term coefficients per k >= 2 (l = m + k):
    #   Pbar_{l,m} = a[k,m] * (x * Pbar_{l-1,m} - b[k,m] * Pbar_{l-2,m})
    a = np.zeros((L, L))
    b = np.zeros((L, L))
    for k in range(2, L):
        for m in range(0, L - k):
            l = m + k
            a[k, m] = math.sqrt((4 * l * l - 1) / (l * l - m * m))
            b[k, m] = math.sqrt(((l - 1) ** 2 - m * m) / (4 * (l - 1) ** 2 - 1))
    # output assembly: column j (l, m order) reads P_flat[:, k*L + |m|]
    gather = np.zeros(L * L, np.int32)
    trig_sel = np.zeros(L * L, np.int32)  # 0: const, 1: cos, 2: sin
    m_sel = np.zeros(L * L, np.int32)
    scale = np.zeros(L * L)
    sqrt2 = math.sqrt(2.0)
    j = 0
    for l in range(L):
        for m in range(-l, l + 1):
            am = abs(m)
            k = l - am
            gather[j] = k * L + am
            m_sel[j] = am
            if convention == "analytic":
                sign, m0_scale = 1.0, math.pi
            else:
                sign, m0_scale = (-1.0) ** am, 1.0
            if m == 0:
                trig_sel[j] = 0
                scale[j] = m0_scale
            elif m > 0:
                trig_sel[j] = 1
                scale[j] = sign * sqrt2
            else:
                trig_sel[j] = 2
                scale[j] = sign * sqrt2
            j += 1
    return d, e, a, b, gather, trig_sel, m_sel, scale


def spherical_harmonics_basis(
    lonlat_deg: jnp.ndarray, L: int, convention: str = "analytic"
) -> jnp.ndarray:
    """Real-SH basis of degree < L at (lon, lat) degree coordinates.

    Vectorized evaluation: the normalized-Legendre recurrence runs over the
    diagonal offset k = l - m with all orders m in parallel ([B, L] tensors),
    followed by one gather + trig multiply to assemble the (l, m)-ordered
    output.  Semantics identical to `spherical_harmonics_basis_looped`.

    Args:
      lonlat_deg: [B, 2] (lon, lat) in degrees.
      L: number of Legendre degrees (output dim = L*L).
      convention: 'analytic' or 'closed-form' (see module docstring).
    Returns:
      [B, L*L] basis matrix, stacked l = 0..L-1, m = -l..l
      (matches `spherical_harmonics.py:34-42`).
    """
    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    dtype = lonlat_deg.dtype
    d_np, e_np, a_np, b_np, gather, trig_sel, m_sel, scale = _sh_plan(L, convention)
    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    x = jnp.cos(theta)[:, None]  # [B, 1]
    s = jnp.sin(theta)[:, None]

    d = jnp.asarray(d_np, dtype)
    e = jnp.asarray(e_np, dtype)

    # s^m via cumprod (avoids log(0) at the poles): [B, L]
    s_pows = jnp.cumprod(jnp.concatenate([jnp.ones_like(s), jnp.tile(s, (1, L - 1))], 1), 1)
    P0 = d * s_pows  # k=0 diagonal, all m
    P1 = e * x * P0  # k=1 (last column m=L-1 is junk; never gathered)

    rows = [P0, P1]
    for k in range(2, L):
        a_k = jnp.asarray(a_np[k], dtype)
        b_k = jnp.asarray(b_np[k], dtype)
        rows.append(a_k * (x * rows[-1] - b_k * rows[-2]))
    P_flat = jnp.concatenate(rows, axis=-1)  # [B, K*L]

    m_arr = jnp.arange(L, dtype=dtype)
    ang = phi[:, None] * m_arr
    cos_m = jnp.cos(ang)
    sin_m = jnp.sin(ang)

    Pg = jnp.take(P_flat, jnp.asarray(gather), axis=-1)  # [B, L*L]
    cg = jnp.take(cos_m, jnp.asarray(m_sel), axis=-1)
    sg = jnp.take(sin_m, jnp.asarray(m_sel), axis=-1)
    tsel = jnp.asarray(trig_sel)
    trig = jnp.where(tsel == 0, 1.0, jnp.where(tsel == 1, cg, sg)).astype(dtype)
    return Pg * trig * jnp.asarray(scale, dtype)


@functools.lru_cache(maxsize=8)
def _sh_times_plan(L: int, convention: str):
    """Static scatter indices for the gather-free fused `basis @ W` path:
    per trig class, the P_flat column p each output column j reads, and
    the scale to fold into W's row j.

    TWO classes, not three: the const class (m = 0, trig factor 1) folds
    into the cos class exactly — cos(0*phi) = 1 — and their scatter
    targets cannot collide (const reads p = k*L + 0, cos reads
    p = k*L + m with m >= 1), so `basis @ W` is TWO full-KL matmuls
    (cos-with-const, sin) instead of three: 2/3 the MXU flops and one
    fewer [KL, D] folded-weight operand."""
    _, _, _, _, gather, trig_sel, _, scale = _sh_plan(L, convention)
    out = []
    for classes in ((0, 1), (2,)):
        j_idx = np.nonzero(np.isin(trig_sel, classes))[0].astype(np.int32)
        out.append((j_idx, gather[j_idx].astype(np.int32),
                    scale[j_idx].copy()))
    return out


@functools.lru_cache(maxsize=8)
def _sh_fourier_plan(L: int) -> np.ndarray:
    """[2L, L*L] trig-synthesis table replacing the sequential recurrence:

        P_flat[:, p] = sum_j cos(j th) * ftab[j, p] + sin(j th) * ftab[L+j, p]

    Every fully-normalized Pbar_{m+k,m}(cos th) is a FINITE trigonometric
    polynomial of degree <= l in th (s^m = sin^m th makes it a pure cosine
    series for even m and a pure sine series for odd m), so the whole
    [B, L*L] P_flat block is ONE [B, 2L] @ [2L, L*L] matmul — MXU work
    instead of L data-dependent sequential VPU steps.  Coefficients come
    from an exact DFT of the f64 recurrence sampled on the full circle
    (s = sin th kept SIGNED so the circle continuation is the analytic
    one).  Measured at L=40: spectral tail beyond degree L-1 < 1e-11,
    max |coef| 0.49, f32 synthesis error ~2e-5 absolute worst-case over
    random inputs incl. near-pole latitudes (P max 2.5; beats the f32
    recurrence's ~6e-5), and exact at the poles (no s^m underflow games
    needed).

    Convention-independent: 'analytic' vs 'closed-form' only rescale the
    output assembly (`_sh_times_plan`), not P_flat.
    """
    _, _, a_np, b_np, _, _, _, _ = _sh_plan(L, "analytic")
    N = 4 * L
    th = 2 * np.pi * np.arange(N) / N
    x, s = np.cos(th), np.sin(th)
    d = np.full(L, 1.0 / math.sqrt(4 * math.pi))
    for m in range(1, L):
        d[m] = d[m - 1] * math.sqrt((2 * m + 1) / (2 * m))
    e = np.sqrt(2 * np.arange(L) + 3.0)
    spow = s[:, None] ** np.arange(L)[None, :]
    rows = [d * spow, e * x[:, None] * (d * spow)]
    for k in range(2, L):
        rows.append(a_np[k] * (x[:, None] * rows[-1] - b_np[k] * rows[-2]))
    P = np.concatenate(rows, axis=1)          # [N, L*L], col p = k*L + m
    P[:, 2 * L - 1] = 0.0  # k=1 junk column (m = L-1, never gathered):
    #                        degree L would break the bandlimit below
    F = np.fft.rfft(P, axis=0) / N
    if np.abs(F[L:]).max() >= 1e-9:
        # guards table correctness (measured headroom ~1e-14 at L=128); a
        # typed error survives `python -O`, unlike the assert it replaced
        raise ValueError(
            f"SH Fourier plan: spectral tail {np.abs(F[L:]).max():.3g} at "
            f"L={L} — recurrence not bandlimited; the generated table "
            "would be wrong")
    ftab = np.zeros((2 * L, L * L))
    ftab[0] = F[0].real
    ftab[1:L] = 2 * F[1:L].real               # cos(j th) coefficients
    ftab[L + 1:2 * L] = -2 * F[1:L].imag      # sin(j th) coefficients
    return ftab


def spherical_harmonics_times(lonlat_deg: jnp.ndarray, L: int,
                              w: jnp.ndarray,
                              convention: str = "analytic",
                              matmul_dtype=None) -> jnp.ndarray:
    """``spherical_harmonics_basis(lonlat_deg, L, convention) @ w`` without
    materializing or permuting the [B, L*L] basis.

    The basis column j is ``P_flat[:, g_j] * trig_j(phi) * scale_j`` where
    trig is 1, cos(m phi) or sin(m phi) and m = g_j % L — so the product
    folds into TWO matmuls on P_flat with W's rows scatter-folded into
    P_flat coordinates and the trig factor applied as a TILED elementwise
    multiply (cos/sin of m*phi repeat over the recurrence row k):

        basis @ W = (P_flat * cos_tile) @ Wc' + (P_flat * sin_tile) @ Ws'

    (the const class m = 0 rides the cos fold: cos(0*phi) = 1 exactly,
    and its scatter targets p = k*L are disjoint from the cos entries'
    p = k*L + m, m >= 1 — see _sh_times_plan).  2x the MXU flops of the
    plain [B,L*L] @ W matmul but ZERO [B, L*L] gathers — measured ~4x
    faster end-to-end on the v5e tunnel at L=40, B=10k (the gathers, not
    the matmul, dominated the SH tower).  Exact same semantics as the
    basis-then-matmul path up to f32 reassociation.

    Args:
      lonlat_deg: [B, 2] (lon, lat) degrees.
      L: Legendre degrees; ``w``: [L*L, D] weight matrix.
      matmul_dtype: optional dtype for the folded matmuls' INPUTS (the
        trig synthesis stays f32, accumulation stays f32 via
        preferred_element_type).  bfloat16 trades ~1e-3 relative output
        error for ~3x MXU rate — the serving opt-in
        (`load_model(tower_matmul='bf16')`).
    Returns: [B, D].
    """
    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    dtype = lonlat_deg.dtype
    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    # trig synthesis: P_flat is ONE [B, 2L] @ [2L, KL] matmul (the L
    # sequential recurrence steps each round-tripped HBM under XLA;
    # see _sh_fourier_plan for the exactness argument)
    ftab = jnp.asarray(_sh_fourier_plan(L), dtype)
    j_arr = jnp.arange(L, dtype=dtype)
    angt = theta[:, None] * j_arr
    fth = jnp.concatenate([jnp.cos(angt), jnp.sin(angt)], axis=1)  # [B, 2L]
    acc = dtype if dtype == jnp.float64 else jnp.float32
    P_flat = jnp.dot(fth, ftab, preferred_element_type=acc).astype(dtype)

    m_arr = jnp.arange(L, dtype=dtype)
    ang = phi[:, None] * m_arr
    # two trig classes: cos (which carries the m=0 / const entries — the
    # m=0 tile columns are cos(0*phi) = 1 exactly) and sin
    trig_tiles = (jnp.tile(jnp.cos(ang), (1, L)),
                  jnp.tile(jnp.sin(ang), (1, L)))

    KL = L * L
    md = matmul_dtype or dtype
    out = None
    for cls, (j_idx, p_idx, sc) in enumerate(_sh_times_plan(L, convention)):
        if len(j_idx) == 0:
            continue
        wf = jnp.zeros((KL, w.shape[1]), w.dtype).at[jnp.asarray(p_idx)].set(
            jnp.asarray(sc, w.dtype)[:, None] * w[jnp.asarray(j_idx)])
        lhs = P_flat * trig_tiles[cls]
        term = jnp.dot(lhs.astype(md), wf.astype(md),
                       preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out.astype(dtype)


def sh_grid_table(L: int, n_lat: int = 181, n_lon: int = 361,
                  convention: str = "analytic") -> jnp.ndarray:
    """Precompute the SH basis on a regular lon/lat grid for interpolation.

    TPU equivalent of `DiscretizedSphericalHarmonics.__init__`
    (`discretized_spherical_harmonics.py:22-38`).

    Returns [n_lat, n_lon, L*L].
    """
    lats = jnp.linspace(-90.0, 90.0, n_lat)
    lons = jnp.linspace(-180.0, 180.0, n_lon)
    grid = jnp.stack(jnp.meshgrid(lons, lats, indexing="xy"), axis=-1)  # [n_lat, n_lon, 2]
    flat = grid.reshape(-1, 2)
    basis = spherical_harmonics_basis(flat, L, convention)
    return basis.reshape(n_lat, n_lon, L * L)


def sh_interpolate(table: jnp.ndarray, lonlat_deg: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of a precomputed SH table at query points.

    TPU equivalent of `discretized_spherical_harmonics.py:40-99` — a gather of
    4 table rows + lerp instead of evaluating the recurrence; useful as a fast
    approximate basis for very large L.

    Args:
      table: [n_lat, n_lon, D] from `sh_grid_table`.
      lonlat_deg: [B, 2].
    Returns:
      [B, D].
    """
    n_lat, n_lon, _ = table.shape
    u = (lonlat_deg[:, 0] + 180.0) / 360.0 * (n_lon - 1)
    v = (lonlat_deg[:, 1] + 90.0) / 180.0 * (n_lat - 1)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n_lon - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, n_lat - 2)
    fu = (u - u0.astype(u.dtype))[:, None]
    fv = (v - v0.astype(v.dtype))[:, None]
    t00 = table[v0, u0]
    t01 = table[v0, u0 + 1]
    t10 = table[v0 + 1, u0]
    t11 = table[v0 + 1, u0 + 1]
    top = t00 * (1 - fu) + t01 * fu
    bot = t10 * (1 - fu) + t11 * fu
    return top * (1 - fv) + bot * fv


def spherical_harmonics_times_pallas(
        lonlat_deg: jnp.ndarray, L: int, w: jnp.ndarray,
        convention: str = "analytic", matmul_dtype=None, bm: int = 512,
        interpret: bool = False) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA-path VJP.

    The kernel itself has no autodiff rule; training (SatCLIP contrastive
    fine-tuning differentiates the tower) takes the gradient of the
    mathematically-equivalent `spherical_harmonics_times` instead — the
    backward pass is off the serving hot path."""
    return _sh_times_pallas_vjp(lonlat_deg, w, L, convention,
                                matmul_dtype, bm, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _sh_times_pallas_vjp(lonlat_deg, w, L, convention, matmul_dtype, bm,
                         interpret):
    return _sh_times_pallas_impl(lonlat_deg, L, w, convention, matmul_dtype,
                                 bm, interpret)


def _sh_times_pallas_fwd(lonlat_deg, w, L, convention, matmul_dtype, bm,
                         interpret):
    out = _sh_times_pallas_impl(lonlat_deg, L, w, convention, matmul_dtype,
                                bm, interpret)
    return out, (lonlat_deg, w)


def _sh_times_pallas_bwd(L, convention, matmul_dtype, bm, interpret, res, g):
    lonlat_deg, w = res
    _, vjp = jax.vjp(
        lambda ll, ww: spherical_harmonics_times(
            ll, L, ww, convention, matmul_dtype=matmul_dtype),
        lonlat_deg, w)
    return vjp(g)


_sh_times_pallas_vjp.defvjp(_sh_times_pallas_fwd, _sh_times_pallas_bwd)


def _sh_times_pallas_impl(
        lonlat_deg: jnp.ndarray, L: int, w: jnp.ndarray,
        convention: str = "analytic", matmul_dtype=None, bm: int = 512,
        interpret: bool = False) -> jnp.ndarray:
    """Fully-fused Pallas variant of `spherical_harmonics_times`.

    One kernel invocation computes, per bm-query block entirely in VMEM:
    the Fourier synthesis of the normalized-Legendre block (ONE
    [KL, 2L] @ [2L, bm] matmul — `_sh_fourier_plan`; this replaced the
    L-step sequential recurrence, which was ~0.6 ms of serialized VPU
    latency at L=40), the phi-trig tiles, and the two folded matmuls.
    Everything runs TRANSPOSED ([row, queries] — the synthesis output
    rows stack along SUBLANES) and the matmuls contract dim 0, like the
    hier scan's tail.  Same semantics as `spherical_harmonics_times` up
    to f32 reassociation; when matmul_dtype=bf16 asks, ALL matmul inputs
    (synthesis included) round to bf16 (~3.5e-3 class at L=40) — with
    matmul_dtype=None the inputs stay f32, so
    `jax_default_matmul_precision` governs the MXU passes exactly as on
    the XLA path."""
    import jax

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    dtype = lonlat_deg.dtype
    B = lonlat_deg.shape[0]
    D = w.shape[1]
    KL = L * L
    md = matmul_dtype or dtype
    Sp = max(8, (4 * L + 7) // 8 * 8)  # prep sublane block, padded to 8
    if not (2 <= L and Sp <= 256):
        # prep packs the four trig blocks into one <= 256-sublane operand
        # (L <= 64) — outside that envelope the XLA fused path serves
        # instead of crashing
        return spherical_harmonics_times(lonlat_deg, L, w, convention,
                                         matmul_dtype=matmul_dtype)
    # clamp the block to the (padded) batch: small online batches should
    # not pay a full 512-row synthesis + matmul
    bm = min(bm, max(128, (B + 127) // 128 * 128))

    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    m_arr = jnp.arange(L, dtype=jnp.float32)
    ang = phi[:, None] * m_arr
    angt = theta[:, None] * m_arr
    prep = jnp.concatenate(
        [jnp.cos(angt), jnp.sin(angt),     # Fourier synthesis inputs in th
         jnp.cos(ang), jnp.sin(ang),       # phi tiles for the output fold
         jnp.zeros((B, Sp - 4 * L), jnp.float32)], axis=1)
    Bp = (B + bm - 1) // bm * bm
    prep = jnp.pad(prep.astype(jnp.float32), ((0, Bp - B), (0, 0))).T

    # scatter-folded weights, one per trig class (same fold as the XLA path)
    wfs = []
    for cls, (j_idx, p_idx, sc) in enumerate(_sh_times_plan(L, convention)):
        wf = jnp.zeros((KL, D), jnp.float32).at[jnp.asarray(p_idx)].set(
            jnp.asarray(sc, jnp.float32)[:, None] * w[jnp.asarray(j_idx)]
            .astype(jnp.float32))
        wfs.append(wf.astype(md))

    # Fourier synthesis table, TRANSPOSED to the kernel layout:
    # P^T [KL, bm] = ftabT [KL, 2L] @ Fth [2L, bm] — stored in md, so the
    # synthesis inputs follow the caller's matmul_dtype contract: bf16
    # only when asked, f32 otherwise (with f32 inputs the dot still runs
    # at the backend's default matmul precision, recoverable to exact via
    # jax_default_matmul_precision — the explicit cast used to preclude
    # that; ADVICE r4)
    ftabT = jnp.asarray(_sh_fourier_plan(L).T, md)

    def kern(pp_ref, ft_ref, wc_ref, ws_ref, o_ref):
        pp = pp_ref[:]                       # [Sp, bm]: cos/sin jth | cos/sin mphi
        fth = pp[0:2 * L, :]                 # [2L, bm]
        cosm = pp[2 * L:3 * L, :]            # [L, bm]
        sinm = pp[3 * L:4 * L, :]
        # synthesis inputs in md (bf16 when matmul_dtype asks — measured
        # maxrel ~3.5e-3 at L=40 vs the MXU's default single-pass rounding
        # anyway); accumulation stays f32 either way
        P = jax.lax.dot_general(ft_ref[:], fth.astype(ft_ref.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # NB products stay f32: a bf16 elementwise pass over the [L*L, bm]
        # block measured SLOWER than f32 (0.88 vs 0.67 ms) and compounds
        # rounding — only the dot INPUTS drop to md
        ct = jnp.tile(cosm, (L, 1))          # [L*L, bm], sublane tile
        st = jnp.tile(sinm, (L, 1))
        dims = (((0,), (0,)), ((), ()))
        # TWO folded matmuls, not three: the const (m=0) class rides the
        # cos fold — cosm row 0 is cos(0*phi) = 1 exactly (_sh_times_plan)
        o = jax.lax.dot_general((P * ct).astype(md), wc_ref[:], dims,
                                preferred_element_type=jnp.float32)
        o += jax.lax.dot_general((P * st).astype(md), ws_ref[:], dims,
                                 preferred_element_type=jnp.float32)
        o_ref[:] = o

    out = pl.pallas_call(
        kern,
        grid=(Bp // bm,),
        in_specs=[
            pl.BlockSpec((Sp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * KL * (2 * L + D * 2),
            bytes_accessed=Bp * (Sp + D) * 4 + KL * (2 * L * 4 + 2 * D * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(prep, ftabT, *wfs)
    return out[:B].astype(dtype)


# ---------------------------------------------------------------------------
# round 5: the FULL SIREN tower in one Pallas kernel


def siren_tower_pallas(lonlat_deg: jnp.ndarray, L: int, params,
                       convention: str = "analytic", matmul_dtype=None,
                       w0_initial: float = 30.0, w0: float = 1.0,
                       bm: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Differentiable full-tower kernel: SH Fourier synthesis + fused
    basis@W0 (`_sh_times_pallas_impl`) PLUS every remaining SIREN layer —
    sin(w0_i * h) activations and the [H, H] hidden / [H, D] output
    matmuls — in the same VMEM-resident pass (round 5, VERDICT r4 #8).

    The unfused remainder was ~6 full-width [B, 256] HBM round trips plus
    per-matmul dispatch; at 10k queries the tower measured 1.17 ms with
    only the first layer fused vs ~0.7 ms fully fused (PERF.md round 5).

    `params` is the SirenNet pytree ({'layers': [...], 'last': {...}});
    semantics match `SirenNet.apply(..., final_activation='identity')` at
    serving (no dropout / mods).  Backward = the XLA-path compose (same
    pattern as `spherical_harmonics_times_pallas`)."""
    return _siren_tower_vjp(lonlat_deg, params, L, convention, matmul_dtype,
                            w0_initial, w0, bm, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _siren_tower_vjp(lonlat_deg, params, L, convention, matmul_dtype,
                     w0_initial, w0, bm, interpret):
    return _siren_tower_impl(lonlat_deg, params, L, convention, matmul_dtype,
                             w0_initial, w0, bm, interpret)


def _siren_tower_fwd(lonlat_deg, params, L, convention, matmul_dtype,
                     w0_initial, w0, bm, interpret):
    out = _siren_tower_impl(lonlat_deg, params, L, convention, matmul_dtype,
                            w0_initial, w0, bm, interpret)
    return out, (lonlat_deg, params)


def _siren_tower_ref(lonlat_deg, params, L, convention, matmul_dtype,
                     w0_initial, w0):
    """XLA-path reference compose (the VJP target and the CPU fallback)."""
    pre = spherical_harmonics_times(lonlat_deg, L, params["layers"][0]["w"],
                                    convention, matmul_dtype=matmul_dtype)
    if "b" in params["layers"][0]:
        pre = pre + params["layers"][0]["b"]
    x = jnp.sin(w0_initial * pre)
    for layer in params["layers"][1:]:
        h = x @ layer["w"]
        if "b" in layer:
            h = h + layer["b"]
        x = jnp.sin(w0 * h)
    out = x @ params["last"]["w"]
    if "b" in params["last"]:
        out = out + params["last"]["b"]
    return out


def _siren_tower_bwd(L, convention, matmul_dtype, w0_initial, w0, bm,
                     interpret, res, g):
    lonlat_deg, params = res
    _, vjp = jax.vjp(
        lambda ll, p: _siren_tower_ref(ll, p, L, convention, matmul_dtype,
                                       w0_initial, w0), lonlat_deg, params)
    return vjp(g)


_siren_tower_vjp.defvjp(_siren_tower_fwd, _siren_tower_bwd)


def _siren_tower_impl(lonlat_deg, params, L, convention, matmul_dtype,
                      w0_initial, w0, bm, interpret):
    import jax

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    dtype = lonlat_deg.dtype
    B = lonlat_deg.shape[0]
    layers = params["layers"]
    last = params["last"]
    H = layers[0]["w"].shape[1]
    D = last["w"].shape[1]
    KL = L * L
    md = matmul_dtype or dtype
    Sp = max(8, (4 * L + 7) // 8 * 8)
    if not (2 <= L and Sp <= 256) or H % 128 or D % 128:
        return _siren_tower_ref(lonlat_deg, params, L, convention,
                                matmul_dtype, w0_initial, w0)
    bm = min(bm, max(128, (B + 127) // 128 * 128))

    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    m_arr = jnp.arange(L, dtype=jnp.float32)
    ang = phi[:, None] * m_arr
    angt = theta[:, None] * m_arr
    prep = jnp.concatenate(
        [jnp.cos(angt), jnp.sin(angt),
         jnp.cos(ang), jnp.sin(ang),
         jnp.zeros((B, Sp - 4 * L), jnp.float32)], axis=1)
    Bp = (B + bm - 1) // bm * bm
    prep = jnp.pad(prep.astype(jnp.float32), ((0, Bp - B), (0, 0))).T

    wfs = []
    for cls, (j_idx, p_idx, sc) in enumerate(_sh_times_plan(L, convention)):
        wf = jnp.zeros((KL, H), jnp.float32).at[jnp.asarray(p_idx)].set(
            jnp.asarray(sc, jnp.float32)[:, None]
            * layers[0]["w"][jnp.asarray(j_idx)].astype(jnp.float32))
        wfs.append(wf.astype(md))
    ftabT = jnp.asarray(_sh_fourier_plan(L).T, md)

    # deeper layers ride one stacked [n*H, H-or-D] operand each for layout
    # simplicity; biases pack as one [n_bias, max(H, D)] f32 block
    deep_ws = [layer["w"].astype(md) for layer in layers[1:]]
    wl = last["w"].astype(md)
    n_deep = len(deep_ws)
    biases = []
    b0 = layers[0].get("b")
    biases.append(jnp.zeros((H,), jnp.float32) if b0 is None
                  else b0.astype(jnp.float32))
    for layer in layers[1:]:
        b = layer.get("b")
        biases.append(jnp.zeros((H,), jnp.float32) if b is None
                      else b.astype(jnp.float32))
    bl = last.get("b")
    W = max(H, D)
    brows = [jnp.pad(b, (0, W - b.shape[0])) for b in biases] + [
        jnp.pad(jnp.zeros((D,), jnp.float32) if bl is None
                else bl.astype(jnp.float32), (0, W - D))]
    bpack = jnp.stack(brows)  # [n_deep + 2, W]

    def kern(pp_ref, ft_ref, wc_ref, ws_ref, b_ref, *wrefs):
        o_ref = wrefs[-1]
        wrefs = wrefs[:-1]
        pp = pp_ref[:]
        fth = pp[0:2 * L, :]
        cosm = pp[2 * L:3 * L, :]
        sinm = pp[3 * L:4 * L, :]
        P = jax.lax.dot_general(ft_ref[:], fth.astype(ft_ref.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ct = jnp.tile(cosm, (L, 1))
        st = jnp.tile(sinm, (L, 1))
        dims = (((0,), (0,)), ((), ()))
        h = jax.lax.dot_general((P * ct).astype(md), wc_ref[:], dims,
                                preferred_element_type=jnp.float32)
        h += jax.lax.dot_general((P * st).astype(md), ws_ref[:], dims,
                                 preferred_element_type=jnp.float32)
        bp = b_ref[:]
        x = jnp.sin(w0_initial * (h + bp[0, :H][None, :]))
        for i in range(n_deep):
            hh = jnp.dot(x.astype(md), wrefs[i][:],
                         preferred_element_type=jnp.float32)
            x = jnp.sin(w0 * (hh + bp[1 + i, :H][None, :]))
        out = jnp.dot(x.astype(md), wrefs[n_deep][:],
                      preferred_element_type=jnp.float32)
        o_ref[:] = out + bp[n_deep + 1, :D][None, :]

    out = pl.pallas_call(
        kern,
        grid=(Bp // bm,),
        in_specs=[
            pl.BlockSpec((Sp, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, 2 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KL, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bpack.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
             for w in deep_ws + [wl]],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * (KL * (2 * L + H * 2) + n_deep * H * H + H * D),
            bytes_accessed=Bp * (Sp + D) * 4
            + KL * (2 * L + 2 * H) * (2 if md == jnp.bfloat16 else 4),
            transcendentals=Bp * H * (1 + n_deep),
        ),
        interpret=interpret,
    )(prep, ftabT, wfs[0], wfs[1], bpack, *deep_ws, wl)
    return out[:B].astype(dtype)
