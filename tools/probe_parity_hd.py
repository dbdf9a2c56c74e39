"""High-dimensional checkerboard-probe parity: the VERDICT r3 #2 bar.

The original probe (tools/probe_parity.py) builds 16-d one-hot values — on
that bank the flagship's rank truncations clamp to a complete basis
(res_rank=128 >= Dv=16, lr_rank=256 >= Dv), so the probe never exercises
the approximations the throughput number is measured with.  This probe
builds **Dv=1024** structured values in which the truncations are ACTIVE:

  value_row = R[label]            (one-hot rotated into 1024-d: 16 random
                                   orthonormal class directions)
            + 0.5 * smooth(loc)   (spectral mixture: 256 random spherical
                                   frequencies of the row's xyz, projected
                                   to 1024-d — locally smooth, globally
                                   high-rank across the bank)
            + 0.3 * noise         (full-width i.i.d. — inflates the
                                   within-group residuals res_rank must
                                   truncate)

so lr_rank=256 genuinely truncates the group-value-sum Gram basis and
res_rank=128 genuinely truncates the 1024-d within-group residuals, exactly
as they do on the bench bank.  The flagship-vs-dense probe gap on THIS bank
is the honest three-bars evidence (bar: within 0.005).
"""
import time

from _tpu_common import jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.data.checkerboard import assign_closest_label, fibonacci_lattice
from range_tpu.eval.probe import evaluate_arrays
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import (SatClipLocationConfig,
                                      SatClipLocationEncoder)

BANK_N = 102_400
N_SUPPORT, N_CLASSES, DV = 100, 16, 1024
rng = np.random.default_rng(3)

s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)


def sample_points(n, seed):
    r = np.random.default_rng(seed)
    lons = r.uniform(-180, 180, n)
    lats = np.degrees(np.arcsin(r.uniform(-1, 1, n)))
    labs = assign_closest_label(lons, lats, s_lon, s_lat, s_lab)
    return np.stack([lons, lats], 1).astype(np.float32), labs


bank_locs, bank_labs = sample_points(BANK_N, 11)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
k = tower.apply(tp, jnp.asarray(bank_locs))
k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
k = k + 0.25 * jax.random.normal(jax.random.PRNGKey(5), k.shape)
keys = np.asarray(k / jnp.linalg.norm(k, axis=1, keepdims=True))

# class directions: one-hot rotated into DV dims (orthonormal via QR)
R = np.linalg.qr(rng.standard_normal((DV, N_CLASSES)))[0].T  # [16, 1024]
# smooth spectral field: random spherical frequencies of xyz -> DV dims
xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(bank_locs)))  # [N, 3]
W = rng.standard_normal((3, 256)) * 3.0                       # ~continental
phase = rng.uniform(0, 2 * np.pi, 256)
phi = np.sin(xyz @ W + phase)                                 # [N, 256]
P = rng.standard_normal((256, DV)).astype(np.float32) / np.sqrt(256)
smooth = (phi @ P).astype(np.float32)

values = (R[bank_labs]
          + 0.5 * smooth
          + 0.3 * rng.standard_normal((BANK_N, DV)).astype(np.float32))
bank = GeoBank.from_arrays(bank_locs, keys, values.astype(np.float32),
                           pad_to=4096)
lap(f"bank built: Dv={DV} (class 16-dir + smooth rank-256 + full noise)")

train_pts, train_y = sample_points(16384, 21)
eval_pts, eval_y = sample_points(8192, 22)


def embed(enc, pts):
    outs = []
    for lo in range(0, len(pts), 8192):
        outs.append(np.asarray(enc(pts[lo:lo + 8192])))
    return np.concatenate(outs, 0)


results = {}
for name, kw in (("dense", {}),
                 # the SHIPPED bundle, truncations ACTIVE (res128/lr256 on
                 # Dv=1024): the headline three-bars probe row
                 ("flagship", dict(profile="flagship")),
                 ("turbo", dict(profile="turbo"))):
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, **kw)
    tr = embed(enc, train_pts)
    ev = embed(enc, eval_pts)
    acc = evaluate_arrays(tr, train_y, ev, eval_y, "checker_100")
    results[name] = acc
    lap(f"{name}: probe acc {acc:.4f}")

delta = results["flagship"] - results["dense"]
print(f"HD PARITY delta (flagship - dense, Dv=1024 active truncations): "
      f"{delta:+.4f} (bar: within 0.005)", flush=True)
print(f"turbo delta: {results['turbo'] - results['dense']:+.4f}", flush=True)
lap("DONE")
