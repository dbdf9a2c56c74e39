"""Round 4f: two-class SH fold (const rides cos) — TPU timing.

The fused `basis @ W` paths (XLA + Pallas) used THREE folded matmuls
(const / cos / sin).  cos(0*phi) = 1 exactly and the const class's scatter
targets (p = k*L) are disjoint from the cos class's (p = k*L + m, m >= 1),
so the const fold merges into the cos matmul: 2/3 the MXU flops and one
fewer [KL, D] resident operand.  This times the Pallas tower kernel and
the full SatCLIP tower apply at the flagship operating point
(L=40, D=256, B=10,240, bf16 matmul inputs) before adoption.
"""
import _tpu_common as C  # noqa: F401  (compilation cache)
import jax
import jax.numpy as jnp
import numpy as np

from range_tpu.models.satclip import (SatClipLocationConfig,
                                      SatClipLocationEncoder)
from range_tpu.ops.sh import (spherical_harmonics_basis,
                              spherical_harmonics_times,
                              spherical_harmonics_times_pallas)

B, L, D = 10_240, 40, 256
rng = np.random.default_rng(0)
lonlat = jnp.asarray(np.stack(
    [rng.uniform(-180, 180, B),
     np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
w = jnp.asarray(rng.normal(size=(L * L, D)) / (L * 2), jnp.float32)

# correctness on-device vs a HOST f64 reference (on the v5e even the
# md=None path rounds through the MXU's default single-pass-bf16 matmul
# precision, ~4e-3 — JAX-wide default, same for the old three-matmul
# fold; CPU parity tests pin the exact semantics)
def basis_np64(lonlat_np, L, convention="analytic"):
    from range_tpu.ops import sh as _sh
    d, e, a, b, gather, trig_sel, m_sel, scale = _sh._sh_plan(L, convention)
    phi = np.radians(lonlat_np[:, 0].astype(np.float64) + 180.0)
    th = np.radians(lonlat_np[:, 1].astype(np.float64) + 90.0)
    x, s = np.cos(th)[:, None], np.sin(th)[:, None]
    spow = s ** np.arange(L)[None, :]
    rows = [d * spow, e * x * (d * spow)]
    for k in range(2, L):
        rows.append(a[k] * (x * rows[-1] - b[k] * rows[-2]))
    P = np.concatenate(rows, 1)[:, gather]
    ang = phi[:, None] * np.arange(L)[None, :]
    trig = np.where(trig_sel == 0, 1.0,
                    np.where(trig_sel == 1, np.cos(ang)[:, m_sel],
                             np.sin(ang)[:, m_sel]))
    return P * trig * scale


basis = basis_np64(np.asarray(lonlat[:256]), L)
ref = jnp.asarray(basis @ np.asarray(w, np.float64), jnp.float32)
for md, bar in ((None, 8e-3), (jnp.bfloat16, 2e-2)):
    for name, fn in (("xla", spherical_harmonics_times),
                     ("pallas", spherical_harmonics_times_pallas)):
        got = fn(lonlat[:256], L, w, matmul_dtype=md)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        status = "OK" if rel < bar else "FAIL"
        print(f"{name:6s} md={md!r:>20s} maxrel={rel:.2e} {status}",
              flush=True)

j_f32 = jax.jit(lambda ll: spherical_harmonics_times_pallas(ll, L, w))
j_bf16 = jax.jit(lambda ll: spherical_harmonics_times_pallas(
    ll, L, w, matmul_dtype=jnp.bfloat16))
print(f"pallas sh_times f32  : {C.timeit(j_f32, lonlat):.3f} ms", flush=True)
print(f"pallas sh_times bf16 : {C.timeit(j_bf16, lonlat):.3f} ms", flush=True)

for md in (None, "bf16"):
    tower = SatClipLocationEncoder(SatClipLocationConfig(
        fused_matmul_dtype=md))
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    jt = jax.jit(lambda ll: tower.apply(tp, ll))
    print(f"tower apply md={md}: {C.timeit(jt, lonlat):.3f} ms", flush=True)
