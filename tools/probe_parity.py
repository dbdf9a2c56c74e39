"""Checkerboard-probe parity: hier serving vs dense exact (the downstream
fidelity bar for the approximate path — VERDICT r1 #2).

Rebuilds the RESULTS.md informative-bank experiment: bank values are noisy
one-hot encodings of the checker_100 label field (standing in for satellite
features that "see the ground"), keys are the seeded SatCLIP tower's
embeddings of the bank locations.  The probe accuracy through the hier
encoder must match the dense encoder's.
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
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder

BANK_N = 102_400
N_SUPPORT, N_CLASSES = 100, 16
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
values = (np.eye(N_CLASSES, dtype=np.float32)[bank_labs]
          + 0.3 * rng.standard_normal((BANK_N, N_CLASSES)).astype(np.float32))
bank = GeoBank.from_arrays(bank_locs, keys, values, pad_to=4096)
lap("bank built")

train_pts, train_y = sample_points(16384, 21)
eval_pts, eval_y = sample_points(8192, 22)


def embed(enc, pts):
    outs = []
    for lo in range(0, len(pts), 8192):
        outs.append(np.asarray(enc(pts[lo:lo + 8192])))
    return np.concatenate(outs, 0)


results = {}
for name, kw in (("dense", {}),
                 # the SHIPPED serving bundle — this row is the headline
                 # probe-parity claim (RESULTS.md: gap -0.0016)
                 ("flagship", dict(profile="flagship")),
                 ("hier", dict(retrieval="hier")),
                 ("hier-K32-g4", dict(retrieval="hier", k_tiles=32, j_sem=3,
                                      gsz_sem=4))):
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, **kw)
    tr = embed(enc, train_pts)
    ev = embed(enc, eval_pts)
    acc = evaluate_arrays(tr, train_y, ev, eval_y, "checker_100")
    results[name] = acc
    lap(f"{name}: probe acc {acc:.4f}")

delta = results["flagship"] - results["dense"]
print(f"PARITY delta (flagship - dense): {delta:+.4f} (bar: within 0.005)",
      flush=True)
lap("DONE")
