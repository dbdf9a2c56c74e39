import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Disentangle the parity4 regression: parity3's union K48/j4 hit probe
0.9528 (gap -0.0046) but parity4's asym K48/j4/kg4 — run AFTER the slim
family-sliced operands landed — measured 0.9382.  Suspects: (a) the geo
family's tiny exact budget (k_geo=4) starves the spatially-sharp geo
softmax on this geo-heavy probe, vs (b) a slim-operand fidelity bug.
Re-measures union (no k_geo) post-slim plus a k_geo ladder."""
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


results = {}
CONFIGS = (
    ("dense", {}),
    # parity3's best, re-run post-slim: if this reproduces 0.9528 the slim
    # operands are clean and k_geo starvation is the regression
    ("union-K48-j4", dict(retrieval="hier", k_tiles=48, j_sem=4)),
    ("asym-K48-j4-kg8", dict(retrieval="hier", k_tiles=48, j_sem=4,
                             k_geo=8)),
    ("asym-K48-j4-kg16", dict(retrieval="hier", k_tiles=48, j_sem=4,
                              k_geo=16)),
    ("asym-K32-j3-kg8", dict(retrieval="hier", k_tiles=32, j_sem=3,
                             k_geo=8)),
)
for name, kw in CONFIGS:
    kw = dict(kw)
    if kw.get("retrieval"):
        kw = dict(kw, hier_cache="/tmp/r3c5_v1.npz")
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, **kw)
    tr = embed(enc, train_pts)
    ev = embed(enc, eval_pts)
    acc = evaluate_arrays(tr, train_y, ev, eval_y, "checker_100")
    results[name] = acc
    lap(f"{name}: probe acc {acc:.4f}")

best = max(v for k_, v in results.items() if k_ != "dense")
print(f"PARITY delta (best hier - dense): {best - results['dense']:+.4f}",
      flush=True)
lap("DONE")
