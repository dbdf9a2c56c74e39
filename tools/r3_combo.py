import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""bn=256 (finer tiles): parts is the dominant cost after slim+lr; at
equal exact-ROW budget finer tiles target better (K=40 x 256 rows =
10.2k rows vs K=32 x 512 = 16.4k).  Measures BOTH throughput (informative
bank) and checkerboard probe for bn256 configs vs the bn512 flagship."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.data.checkerboard import assign_closest_label, fibonacci_lattice
from range_tpu.eval.probe import evaluate_arrays
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import retrieve
from range_tpu.ops.retrieval_hier import retrieve_hier

B = 10_240


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

    # ---- throughput: informative bank ----
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    nref = 2048
    ref = np.asarray(retrieve(q[:nref], q_xyz[:nref], bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=4096))
    lap("queries + reference ready")

    def load(tag, **bkw):
        enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                   seed=0, chunk=4096,
                                   hier_cache=f"/tmp/r3combo_{tag}.npz",
                                   **bkw)
        lap(f"bank {tag} ready")
        return enc.extra

    hb512 = load("bn512lr", lr_rank=256)
    hb256 = load("bn256lr", hier_bn=256, gsz_geo=32, lr_rank=256)

    for tag, hbx, kw in (
            ("bn512 K=32 j3 kg4 (flagship)", hb512,
             dict(k_tiles=32, j_sem=3, k_geo=4)),
            ("bn256 K=40 j3 kg6", hb256, dict(k_tiles=40, j_sem=3, k_geo=6)),
            ("bn256 K=48 j3 kg6", hb256, dict(k_tiles=48, j_sem=3, k_geo=6)),
            ("bn256 K=64 j4 kg6", hb256, dict(k_tiles=64, j_sem=4, k_geo=6)),
    ):
        ms = t(retrieve_hier, q, q_xyz, hbx, **kw)
        out = np.asarray(retrieve_hier(q[:nref], q_xyz[:nref], hbx, bm=128,
                                       **kw))
        r = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
        lap(f"TIME {tag}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s "
            f"relerr {r.mean():.4f}")

    # ---- probe: checkerboard bank ----
    N_SUPPORT, N_CLASSES = 100, 16
    s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)

    def sample_points(n, seed):
        r = np.random.default_rng(seed)
        lons = r.uniform(-180, 180, n)
        lats = np.degrees(np.arcsin(r.uniform(-1, 1, n)))
        labs = assign_closest_label(lons, lats, s_lon, s_lat, s_lab)
        return np.stack([lons, lats], 1).astype(np.float32), labs

    bank_locs, bank_labs = sample_points(102_400, 11)
    kk = tower.apply(tp, jnp.asarray(bank_locs))
    kk = kk / jnp.linalg.norm(kk, axis=1, keepdims=True)
    kk = kk + 0.25 * jax.random.normal(jax.random.PRNGKey(5), kk.shape)
    keys = np.asarray(kk / jnp.linalg.norm(kk, axis=1, keepdims=True))
    rng2 = np.random.default_rng(3)
    values = (np.eye(N_CLASSES, dtype=np.float32)[bank_labs]
              + 0.3 * rng2.standard_normal(
                  (102_400, N_CLASSES)).astype(np.float32))
    cbank = GeoBank.from_arrays(bank_locs, keys, values, pad_to=4096)
    train_pts, train_y = sample_points(16384, 21)
    eval_pts, eval_y = sample_points(8192, 22)
    lap("checker bank ready")

    def embed(enc, pts):
        outs = []
        for lo in range(0, len(pts), 8192):
            outs.append(np.asarray(enc(pts[lo:lo + 8192])))
        return np.concatenate(outs, 0)

    accs = {}
    for name, kw in (
            ("dense", {}),
            ("bn256-K40-j3-kg6", dict(retrieval="hier", hier_bn=256,
                                      gsz_geo=32, k_tiles=40, j_sem=3,
                                      k_geo=6)),
            ("bn256-K64-j4-kg6", dict(retrieval="hier", hier_bn=256,
                                      gsz_geo=32, k_tiles=64, j_sem=4,
                                      k_geo=6)),
    ):
        if kw.get("retrieval"):
            kw = dict(kw, hier_cache="/tmp/r3combo_chk256.npz")
        enc = range_tpu.load_model("RANGE+", db_path=cbank, beta=0.5,
                                   chunk=4096, seed=0, **kw)
        acc = evaluate_arrays(embed(enc, train_pts), train_y,
                              embed(enc, eval_pts), eval_y, "checker_100")
        accs[name] = acc
        lap(f"PROBE {name}: {acc:.4f}")
    print(f"PARITY delta: "
          f"{max(v for k2, v in accs.items() if k2 != 'dense') - accs['dense']:+.4f}",
          flush=True)


if __name__ == "__main__":
    main()
