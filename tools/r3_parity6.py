import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Refine the asym config ladder around the parity5 finding (kg16 closed
the gap: K48/j4/kg16 -> 0.9553 vs dense 0.9574): find the CHEAPEST
(K_sem, kg) pair still inside the 0.005 parity bar."""
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


def embed(enc, pts, chunk=8192):
    outs = []
    for lo in range(0, len(pts), chunk):
        outs.append(np.asarray(enc(pts[lo:lo + chunk])))
    return np.concatenate(outs, 0)


DENSE_ACC = 0.9574  # parity5 (same bank/seeds)
results = {}
CONFIGS = (
    ("asym-K32-j3-kg16", dict(k_tiles=32, j_sem=3, k_geo=16)),
    ("asym-K24-j3-kg16", dict(k_tiles=24, j_sem=3, k_geo=16)),
    ("asym-K40-j3-kg16", dict(k_tiles=40, j_sem=3, k_geo=16)),
    ("asym-K48-j4-kg24", dict(k_tiles=48, j_sem=4, k_geo=24)),
    ("asym-K32-j3-kg24", dict(k_tiles=32, j_sem=3, k_geo=24)),
)
for name, kw in CONFIGS:
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, retrieval="hier",
                               hier_cache="/tmp/r3c5_v1.npz", **kw)
    tr = embed(enc, train_pts)
    ev = embed(enc, eval_pts)
    acc = evaluate_arrays(tr, train_y, ev, eval_y, "checker_100")
    results[name] = acc
    lap(f"{name}: probe acc {acc:.4f} (gap {acc - DENSE_ACC:+.4f})")

best = max(results.values())
print(f"PARITY delta (best hier - dense): {best - DENSE_ACC:+.4f}",
      flush=True)
lap("DONE")
