import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Residual-rank parts battery (the round-3 flop-cut lever): the parts
kernels are COMPUTE-bound (int8 values measured a wash, r3_vq), and their
[bn, Dv] value matmul is ~60% of parts flops.  res_rank replaces it with
group-mean + rank-k projected residuals (exact for k >= Dv; the probe
bank's Dv=16 makes the PROBE immune by construction — the bar that can
move is the 1024-d feature relerr, measured here vs f32 dense).  Times
each config on the informative 100k bank, then probes checker_100."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp, standard_fixture

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.data.checkerboard import assign_closest_label, fibonacci_lattice
from range_tpu.eval.probe import evaluate_arrays
from range_tpu.ops.retrieval import retrieve as retrieve_ref
from range_tpu.ops.retrieval_hier import retrieve_hier

B = 10_240
CFGS = [
    ("flagship512", dict(lr_rank=256), dict(bm=256, k_tiles=32, j_sem=3,
                                            k_geo=16, scan_bm=512)),
    ("512+res256", dict(lr_rank=256, res_rank=256),
     dict(bm=256, k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)),
    ("512+res128", dict(lr_rank=256, res_rank=128),
     dict(bm=256, k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)),
    ("bn256K40+res256", dict(lr_rank=256, res_rank=256, hier_bn=256,
                             gsz_geo=32),
     dict(bm=256, k_tiles=40, j_sem=3, k_geo=20, scan_bm=512)),
    ("bn256K40", dict(lr_rank=256, hier_bn=256, gsz_geo=32),
     dict(bm=256, k_tiles=40, j_sem=3, k_geo=20, scan_bm=512)),
]


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, **kw):
    # deep-queue timer: shallow loops measure the ~3.5 ms/call tunnel
    # feed rate, not the device (PERF.md round 3b)
    from _tpu_common import timeit

    return timeit(fn, *a, **kw)


def main():
    print("device:", jax.devices()[0], flush=True)

    bank, q, q_xyz = standard_fixture(b=B)
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    lap("dense reference ready")
    for name, bkw, skw in CFGS:
        try:
            enc = range_tpu.load_model(
                "RANGE+", db_path=bank, retrieval="hier", seed=0, chunk=4096,
                hier_cache=f"/tmp/r3res_{name}.npz", **bkw)
            hb = enc.extra
            ms = t(retrieve_hier, q, q_xyz, hb, **skw)
            out = np.asarray(retrieve_hier(q, q_xyz, hb, **skw))
            rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
            lap(f"TIME {name}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s | "
                f"relerr mean {rel.mean():.4f} p99 "
                f"{np.percentile(rel, 99):.4f}")
            del enc, hb
        except Exception as e:
            lap(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")

    # ---- probe: checkerboard bank ----
    N_SUPPORT, N_CLASSES = 100, 16
    rng = np.random.default_rng(3)
    s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)

    def sample_points(n, seed):
        r = np.random.default_rng(seed)
        lons = r.uniform(-180, 180, n)
        lats = np.degrees(np.arcsin(r.uniform(-1, 1, n)))
        labs = assign_closest_label(lons, lats, s_lon, s_lat, s_lab)
        return np.stack([lons, lats], 1).astype(np.float32), labs

    bank_locs, bank_labs = sample_points(102_400, 11)
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    @jax.jit
    def _keys(p, locs):
        return tower.nnet.apply(p, tower.posenc(locs))

    k = jnp.concatenate(
        [_keys(tp, jnp.asarray(bank_locs[lo:lo + 10_240]))
         for lo in range(0, len(bank_locs), 10_240)], axis=0)
    k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
    k = k + 0.25 * jax.random.normal(jax.random.PRNGKey(5), k.shape)
    keys = np.asarray(k / jnp.linalg.norm(k, axis=1, keepdims=True))
    values = (np.eye(N_CLASSES, dtype=np.float32)[bank_labs]
              + 0.3 * rng.standard_normal((102_400, N_CLASSES))
              .astype(np.float32))
    cbank = GeoBank.from_arrays(bank_locs, keys, values, pad_to=4096)
    train_pts, train_y = sample_points(16384, 21)
    eval_pts, eval_y = sample_points(8192, 22)
    lap("probe bank ready")

    def embed(enc, pts):
        outs = []
        for lo in range(0, len(pts), 8192):
            outs.append(np.asarray(enc(pts[lo:lo + 8192])))
        return np.concatenate(outs, 0)

    DENSE_ACC = 0.9574  # r3_parity5 (same bank/seeds)
    for name, bkw, skw in CFGS:
        try:
            e = range_tpu.load_model(
                "RANGE+", db_path=cbank, beta=0.5, chunk=4096, seed=0,
                retrieval="hier", hier_cache=f"/tmp/r3resp_{name}.npz",
                k_tiles=skw["k_tiles"], j_sem=skw["j_sem"],
                k_geo=skw["k_geo"], hier_scan_bm=skw["scan_bm"], **bkw)
            acc = evaluate_arrays(embed(e, train_pts), train_y,
                                  embed(e, eval_pts), eval_y, "checker_100")
            lap(f"PROBE {name}: {acc:.4f} (gap {acc - DENSE_ACC:+.4f})")
            del e
        except Exception as e:
            lap(f"FAIL probe {name}: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
