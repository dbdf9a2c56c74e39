"""Spherical-harmonics correctness: vs scipy, sympy, and the reference torch
closed-form implementation."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from range_tpu.ops.sh import sh_grid_table, sh_interpolate, spherical_harmonics_basis

from reference_loader import load_reference_pe


def _rand_lonlat(n, seed=0):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-89, 89, n)
    return np.stack([lon, lat], 1)


def test_closed_form_matches_reference_torch():
    import torch

    refpe = load_reference_pe()
    lonlat = _rand_lonlat(64)
    L = 12
    ref_mod = refpe.SphericalHarmonics(legendre_polys=L, harmonics_calculation="closed-form")
    ref = ref_mod(torch.tensor(lonlat, dtype=torch.float64)).numpy()
    got = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), L, "closed-form"))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_closed_form_matches_scipy():
    from scipy.special import sph_harm_y

    lonlat = _rand_lonlat(32, seed=1)
    phi = np.deg2rad(lonlat[:, 0] + 180)
    theta = np.deg2rad(lonlat[:, 1] + 90)
    L = 8
    got = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), L, "closed-form"))
    col = 0
    for l in range(L):
        for m in range(-l, l + 1):
            y = sph_harm_y(l, abs(m), theta, phi)  # complex Y_l^m incl. CS phase
            if m == 0:
                expect = y.real
            elif m > 0:
                expect = math.sqrt(2) * y.real
            else:
                expect = math.sqrt(2) * y.imag
            np.testing.assert_allclose(got[:, col], expect, rtol=1e-8, atol=1e-10,
                                       err_msg=f"(l={l}, m={m})")
            col += 1


def test_analytic_matches_sympy_table():
    """The 'analytic' convention must reproduce the sympy-generated table the
    SatCLIP checkpoints were trained on (incl. its pi-scaled m=0 and its
    cancelled Condon-Shortley phase)."""
    import sympy
    from sympy import Abs, Symbol, assoc_legendre, cos, factorial, pi, sin, sqrt

    theta_s, phi_s = Symbol("theta"), Symbol("phi")

    def ylm_expr(l, m):
        # transcription of the generator's math
        # (spherical_harmonics_generate_ylms.py:19-35)
        if m < 0:
            plm = assoc_legendre(l, Abs(m), cos(theta_s))
            plm_bar = sqrt(((2 * l + 1) / (4 * pi)) * (factorial(l - Abs(m)) / factorial(l + Abs(m)))) * plm
            return (-1) ** m * sqrt(2) * plm_bar * sin(Abs(m) * phi_s)
        if m == 0:
            return sqrt((2 * l + 1) / 4 * pi) * assoc_legendre(l, m, cos(theta_s))
        plm = assoc_legendre(l, m, cos(theta_s))
        plm_bar = sqrt(((2 * l + 1) / (4 * pi)) * (factorial(l - m) / factorial(l + m))) * plm
        return (-1) ** m * sqrt(2) * plm_bar * cos(m * phi_s)

    lonlat = _rand_lonlat(8, seed=2)
    phi = np.deg2rad(lonlat[:, 0] + 180)
    theta = np.deg2rad(lonlat[:, 1] + 90)
    L = 5
    got = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), L, "analytic"))
    col = 0
    for l in range(L):
        for m in range(-l, l + 1):
            f = sympy.lambdify((theta_s, phi_s), ylm_expr(l, m), "numpy")
            expect = np.broadcast_to(np.asarray(f(theta, phi), np.float64), theta.shape)
            np.testing.assert_allclose(got[:, col], expect, rtol=1e-9, atol=1e-12,
                                       err_msg=f"(l={l}, m={m})")
            col += 1


def test_f32_stability_at_L40():
    """The normalized recurrence must stay accurate in f32 at SatCLIP's L=40
    (the raw reference recurrence overflows f32 around l~30)."""
    lonlat = _rand_lonlat(128, seed=3)
    L = 40
    hi = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), L, "analytic"))
    lo = np.asarray(
        spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float32), L, "analytic")
    ).astype(np.float64)
    assert np.all(np.isfinite(lo))
    denom = np.maximum(np.abs(hi), 1.0)
    assert np.max(np.abs(hi - lo) / denom) < 5e-4


def test_discretized_interpolation_close():
    lonlat = _rand_lonlat(64, seed=4)
    L = 6
    table = sh_grid_table(L, n_lat=721, n_lon=1441, convention="analytic")
    approx = np.asarray(sh_interpolate(table, jnp.asarray(lonlat, jnp.float64)))
    exact = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), L, "analytic"))
    np.testing.assert_allclose(approx, exact, atol=2e-3)


def test_vectorized_matches_looped():
    from range_tpu.ops.sh import spherical_harmonics_basis_looped

    lonlat = _rand_lonlat(32, seed=7)
    for conv in ("analytic", "closed-form"):
        fast = np.asarray(spherical_harmonics_basis(jnp.asarray(lonlat, jnp.float64), 20, conv))
        slow = np.asarray(spherical_harmonics_basis_looped(jnp.asarray(lonlat, jnp.float64), 20, conv))
        np.testing.assert_allclose(fast, slow, rtol=1e-12, atol=1e-12)


def test_times_fused_matches_basis_matmul_f64():
    """spherical_harmonics_times == basis @ w exactly (up to f64 roundoff)
    in f64 — the fused gather-free path is the same contraction with the
    scale folded into W's rows and trig applied as a tiled multiply."""
    from range_tpu.ops.sh import spherical_harmonics_times

    rng = np.random.default_rng(0)
    ll = jnp.asarray(_rand_lonlat(64), jnp.float64)
    for L in (8, 40):
        for conv in ("analytic", "closed-form"):
            w = jnp.asarray(rng.standard_normal((L * L, 48)))
            ref = np.asarray(spherical_harmonics_basis(ll, L, conv) @ w)
            out = np.asarray(spherical_harmonics_times(ll, L, w, conv))
            den = np.abs(ref).max()
            assert np.abs(out - ref).max() / den < 1e-6, (L, conv)


def test_times_fused_f32_precision_class():
    """At f32 the fused path stays in the SAME precision class as the
    basis-then-matmul path (both vs f64 ground truth) — reassociation
    only, no accuracy regression for the serving tower."""
    from range_tpu.ops.sh import spherical_harmonics_times

    rng = np.random.default_rng(1)
    L = 40
    ll = _rand_lonlat(128, seed=1)
    w = rng.standard_normal((L * L, 64))
    ref64 = np.asarray(spherical_harmonics_basis(
        jnp.asarray(ll, jnp.float64), L) @ jnp.asarray(w))
    ll32, w32 = jnp.asarray(ll, jnp.float32), jnp.asarray(w, jnp.float32)
    base32 = np.asarray(spherical_harmonics_basis(ll32, L) @ w32)
    fuse32 = np.asarray(spherical_harmonics_times(ll32, L, w32))
    den = np.abs(ref64).max()
    e_base = np.abs(base32 - ref64).max() / den
    e_fuse = np.abs(fuse32 - ref64).max() / den
    assert e_fuse < 3.0 * max(e_base, 1e-6), (e_fuse, e_base)


def test_tower_fused_first_layer_matches_unfused():
    """The SatCLIP tower's f32 fused-SH fast path (satclip.py
    _fused_first_preact) agrees with the unfused basis->net compose to
    f32-reassociation tolerance, and f64 bypasses the fused path."""
    import jax

    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    enc = SatClipLocationEncoder(SatClipLocationConfig(
        legendre_polys=16, capacity=128, num_hidden_layers=2, embed_dim=64))
    params = enc.init(jax.random.PRNGKey(0))
    ll = jnp.asarray(_rand_lonlat(256, seed=2), jnp.float32)
    fused = np.asarray(enc.apply(params, ll))
    basis = enc.posenc(ll)
    unfused = np.asarray(enc.nnet.apply(params, basis))
    cos = np.sum(fused * unfused, 1) / (
        np.linalg.norm(fused, axis=1) * np.linalg.norm(unfused, axis=1))
    assert cos.min() > 0.99999, cos.min()


def test_sh_times_pallas_matches_xla():
    """The fully-fused Pallas first-layer kernel (interpret mode on CPU)
    matches the XLA fused path within the kernel's documented precision
    class, for both conventions.

    With matmul_dtype=None every kernel input stays f32 (ADVICE r4 —
    gated, no hardcoded bf16 cast), so the difference vs the XLA fused
    path is pure f32 reassociation: tight tolerance.  The XLA fused
    path's own exactness vs the basis matmul is bounded at 1e-6 relative
    in f64 by test_times_fused_matches_basis_matmul_f64 and by the
    precision-class check in test_times_fused_f32_precision_class.  An
    explicit matmul_dtype=bf16 case pins the opt-in rounding class."""
    import functools

    import numpy as np

    from range_tpu.ops.sh import (spherical_harmonics_times,
                                  spherical_harmonics_times_pallas)

    L = 12
    rng = np.random.default_rng(0)
    ll = jnp.asarray(np.stack([rng.uniform(-180, 180, 256),
                               rng.uniform(-90, 90, 256)], 1), jnp.float32)
    w = jnp.asarray(rng.standard_normal((L * L, 64)).astype(np.float32))
    for conv in ("analytic", "closed-form"):
        a = np.asarray(spherical_harmonics_times(ll, L, w, conv))
        b = np.asarray(spherical_harmonics_times_pallas(
            ll, L, w, conv, bm=128, interpret=True))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4 * np.abs(a).max())
    # opt-in bf16 matmul inputs: bf16-rounding class (~4e-3), same contract
    # as the serving tower_matmul='bf16' configuration
    a = np.asarray(spherical_harmonics_times(ll, L, w))
    b16 = np.asarray(spherical_harmonics_times_pallas(
        ll, L, w, matmul_dtype=jnp.bfloat16, bm=128, interpret=True))
    np.testing.assert_allclose(b16, a, rtol=8e-3, atol=8e-3 * np.abs(a).max())


def test_sh_times_pallas_grad_matches_xla():
    """The Pallas first-layer kernel is differentiable: its custom_vjp
    backward is the XLA fused path, so grads must match the XLA path's
    (training differentiates the tower through this function on TPU)."""
    import functools

    import numpy as np

    from range_tpu.ops.sh import (spherical_harmonics_times,
                                  spherical_harmonics_times_pallas)

    L = 8
    rng = np.random.default_rng(1)
    ll = jnp.asarray(np.stack([rng.uniform(-180, 180, 128),
                               rng.uniform(-85, 85, 128)], 1), jnp.float32)
    w = jnp.asarray(rng.standard_normal((L * L, 32)).astype(np.float32))

    def loss_p(w):
        return jnp.sum(spherical_harmonics_times_pallas(
            ll, L, w, bm=128, interpret=True) ** 2)

    def loss_x(w):
        return jnp.sum(spherical_harmonics_times(ll, L, w) ** 2)

    import jax

    gp = np.asarray(jax.grad(loss_p)(w))
    gx = np.asarray(jax.grad(loss_x)(w))
    # the backward IS the XLA path (exact); the residual difference is the
    # f32-reassociation of the Pallas FORWARD feeding sum(y^2)'s cotangent
    # 2*y (matmul_dtype=None keeps every kernel input f32 — ADVICE r4)
    np.testing.assert_allclose(gp, gx, rtol=1e-3,
                               atol=1e-3 * np.abs(gx).max())


def test_siren_tower_pallas_full_stack():
    """The round-5 full-tower kernel (SH synthesis + every SIREN layer in
    one Pallas pass) matches the unfused basis->net compose at the fused
    path's precision class, is bit-identical to its own XLA reference
    compose in interpret mode, and differentiates (backward = XLA ref)."""
    import jax
    import numpy as np

    from range_tpu.ops.nets import SirenNet
    from range_tpu.ops.posenc import SphericalHarmonics
    from range_tpu.ops.sh import _siren_tower_ref, siren_tower_pallas

    L = 16
    net = SirenNet(dim_in=L * L, dim_hidden=256, dim_out=256, num_layers=2)
    p = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ll = jnp.asarray(np.stack([rng.uniform(-180, 180, 300),
                               rng.uniform(-90, 90, 300)], 1), jnp.float32)
    ref = np.asarray(net.apply(p, SphericalHarmonics(legendre_polys=L)(ll)))
    xla = np.asarray(_siren_tower_ref(ll, p, L, "analytic", None, 30.0, 1.0))
    out = np.asarray(siren_tower_pallas(ll, L, p, bm=128, interpret=True))
    np.testing.assert_allclose(out, xla, rtol=0, atol=1e-6)
    cos = np.sum(out * ref, 1) / (np.linalg.norm(out, axis=1)
                                  * np.linalg.norm(ref, axis=1))
    assert cos.min() > 0.99999, cos.min()

    def loss_p(pp):
        return jnp.sum(siren_tower_pallas(ll, L, pp, bm=128,
                                          interpret=True) ** 2)

    def loss_r(pp):
        return jnp.sum(_siren_tower_ref(ll, pp, L, "analytic", None,
                                        30.0, 1.0) ** 2)

    g1 = jax.grad(loss_p)(p)
    g2 = jax.grad(loss_r)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_siren_tower_pallas_through_encoder():
    """SatClipLocationEncoder.apply routes serving through the full-tower
    kernel (CPU: interpret mode) and still matches the unfused compose;
    training=True keeps the differentiable non-kernel path."""
    import jax
    import numpy as np

    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    enc = SatClipLocationEncoder(SatClipLocationConfig(
        legendre_polys=16, capacity=128, num_hidden_layers=2, embed_dim=64))
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    ll = jnp.asarray(np.stack([rng.uniform(-180, 180, 256),
                               rng.uniform(-90, 90, 256)], 1), jnp.float32)
    fused = np.asarray(enc.apply(params, ll))
    unfused = np.asarray(enc.nnet.apply(params, enc.posenc(ll)))
    cos = np.sum(fused * unfused, 1) / (
        np.linalg.norm(fused, axis=1) * np.linalg.norm(unfused, axis=1))
    assert cos.min() > 0.99999, cos.min()
