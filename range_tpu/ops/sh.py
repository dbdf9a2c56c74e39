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
    for each trig class (const / cos / sin), the P_flat column p each
    output column j reads, and the scale to fold into W's row j."""
    _, _, _, _, gather, trig_sel, _, scale = _sh_plan(L, convention)
    out = []
    for cls in (0, 1, 2):
        j_idx = np.nonzero(trig_sel == cls)[0].astype(np.int32)
        out.append((j_idx, gather[j_idx].astype(np.int32),
                    scale[j_idx].copy()))
    return out


def spherical_harmonics_times(lonlat_deg: jnp.ndarray, L: int,
                              w: jnp.ndarray,
                              convention: str = "analytic",
                              matmul_dtype=None) -> jnp.ndarray:
    """``spherical_harmonics_basis(lonlat_deg, L, convention) @ w`` without
    materializing or permuting the [B, L*L] basis.

    The basis column j is ``P_flat[:, g_j] * trig_j(phi) * scale_j`` where
    trig is 1, cos(m phi) or sin(m phi) and m = g_j % L — so the product
    folds into three matmuls on P_flat with W's rows scatter-folded into
    P_flat coordinates and the trig factor applied as a TILED elementwise
    multiply (cos/sin of m*phi repeat over the recurrence row k):

        basis @ W = P_flat @ W0' + (P_flat * cos_tile) @ Wc'
                    + (P_flat * sin_tile) @ Ws'

    3x the MXU flops of the plain [B,L*L] @ W matmul but ZERO [B, L*L]
    gathers — measured ~4x faster end-to-end on the v5e tunnel at L=40,
    B=10k (the gathers, not the matmul, dominated the SH tower).  Exact
    same semantics as the basis-then-matmul path up to f32 reassociation.

    Args:
      lonlat_deg: [B, 2] (lon, lat) degrees.
      L: Legendre degrees; ``w``: [L*L, D] weight matrix.
      matmul_dtype: optional dtype for the three matmuls' INPUTS (the
        recurrence and trig stay f32, accumulation stays f32 via
        preferred_element_type).  bfloat16 trades ~1e-3 relative output
        error for ~3x MXU rate — the serving opt-in
        (`load_model(tower_matmul='bf16')`).
    Returns: [B, D].
    """
    if convention not in ("analytic", "closed-form"):
        raise ValueError(f"unknown SH convention: {convention}")
    dtype = lonlat_deg.dtype
    d_np, e_np, a_np, b_np, _, _, _, _ = _sh_plan(L, convention)
    lon = lonlat_deg[..., 0]
    lat = lonlat_deg[..., 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    x = jnp.cos(theta)[:, None]
    s = jnp.sin(theta)[:, None]
    d = jnp.asarray(d_np, dtype)
    e = jnp.asarray(e_np, dtype)
    s_pows = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(s), jnp.tile(s, (1, L - 1))], 1), 1)
    P0 = d * s_pows
    P1 = e * x * P0
    rows = [P0, P1]
    for k in range(2, L):
        a_k = jnp.asarray(a_np[k], dtype)
        b_k = jnp.asarray(b_np[k], dtype)
        rows.append(a_k * (x * rows[-1] - b_k * rows[-2]))
    P_flat = jnp.concatenate(rows, axis=-1)  # [B, K*L], K = L

    m_arr = jnp.arange(L, dtype=dtype)
    ang = phi[:, None] * m_arr
    trig_tiles = (None, jnp.tile(jnp.cos(ang), (1, L)),
                  jnp.tile(jnp.sin(ang), (1, L)))

    KL = L * L
    md = matmul_dtype or dtype
    out = None
    for cls, (j_idx, p_idx, sc) in enumerate(_sh_times_plan(L, convention)):
        if len(j_idx) == 0:
            continue
        wf = jnp.zeros((KL, w.shape[1]), w.dtype).at[jnp.asarray(p_idx)].set(
            jnp.asarray(sc, w.dtype)[:, None] * w[jnp.asarray(j_idx)])
        lhs = P_flat if trig_tiles[cls] is None else P_flat * trig_tiles[cls]
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
