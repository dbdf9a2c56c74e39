import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""int8-value + finer-tile battery: the parts kernels sit at the HBM/MXU
roofline ridge (~240 flops/byte), so int8 VALUES (compute-neutral on this
stack, PERF.md exp1 — but the parts value stream is the bandwidth line)
and bn=256 finer tiles (fewer exact rows at equal coverage) are the two
zero-new-kernel levers left.  Measures BOTH bars per config: retrieval
ms on the informative 100k bank AND the checker_100 one-hot probe."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp, standard_fixture

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank, quantize_values
from range_tpu.data.checkerboard import assign_closest_label, fibonacci_lattice
from range_tpu.eval.probe import evaluate_arrays
from range_tpu.ops.retrieval_hier import retrieve_hier

B = 10_240
# cfg: (name, build kwargs, serve kwargs)
CFGS = [
    ("flagship512", dict(lr_rank=256), dict(bm=256, k_tiles=32, j_sem=3,
                                            k_geo=16, scan_bm=512)),
    ("512+int8", dict(lr_rank=256, value_quant="int8"),
     dict(bm=256, k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)),
    ("bn256K40", dict(lr_rank=256, hier_bn=256),
     dict(bm=256, k_tiles=40, j_sem=3, k_geo=20, scan_bm=512)),
    ("bn256K40+int8", dict(lr_rank=256, hier_bn=256, value_quant="int8"),
     dict(bm=256, k_tiles=40, j_sem=3, k_geo=20, scan_bm=512)),
    ("bn256K56", dict(lr_rank=256, hier_bn=256),
     dict(bm=256, k_tiles=56, j_sem=3, k_geo=24, scan_bm=512)),
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

    # ---- timing: informative bank ----
    bank, q, q_xyz = standard_fixture(b=B)
    for name, bkw, skw in CFGS:
        bkw = dict(bkw)
        vq = bkw.pop("value_quant", None)
        bk = quantize_values(bank) if vq == "int8" else bank
        enc = range_tpu.load_model(
            "RANGE+", db_path=bk, retrieval="hier", seed=0, chunk=4096,
            hier_cache=f"/tmp/r3vq_{name}.npz", **bkw)
        hb = enc.extra
        ms = t(retrieve_hier, q, q_xyz, hb, **skw)
        lap(f"TIME {name}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")
        del enc, hb, bk

    # ---- probe: checkerboard bank (one-hot values, the hard case) ----
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
        bkw = dict(bkw)
        vq = bkw.pop("value_quant", None)
        cb = quantize_values(cbank) if vq == "int8" else cbank
        e = range_tpu.load_model(
            "RANGE+", db_path=cb, beta=0.5, chunk=4096, seed=0,
            retrieval="hier", hier_cache=f"/tmp/r3vqp_{name}.npz",
            k_tiles=skw["k_tiles"], j_sem=skw["j_sem"],
            k_geo=skw["k_geo"], hier_scan_bm=skw["scan_bm"], **bkw)
        acc = evaluate_arrays(embed(e, train_pts), train_y,
                              embed(e, eval_pts), eval_y, "checker_100")
        lap(f"PROBE {name}: {acc:.4f} (gap {acc - DENSE_ACC:+.4f})")
        del e, cb


if __name__ == "__main__":
    main()
