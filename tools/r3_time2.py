import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""T2 rerun with CORRECT ground truth: exact_nn must rank over each
build's OWN row order (hb.bank), not the source bank — r3_time1's T2
compared apples to a different permutation and printed recall 0.
Banks come from r3_time1's /tmp caches (no rebuild)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import hier_topk, load_hier_bank

BANK_N = 100_000
B = 10_240


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, iters=10, **kw):
    f = functools.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (time.perf_counter() - s) / iters)
    return best * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    lap("queries ready")

    for tag, path, cfgs in (
        ("v1", "/tmp/r3t_v1.npz", (
            ("K=56", dict(k_tiles=56)),
            ("K=40", dict(k_tiles=40)),
            ("bm128 K=32", dict(k_tiles=32, bm=128)),
        )),
        ("sup64", "/tmp/r3t_sup64.npz", (
            ("M=96 K=48", dict(k_tiles=48, m_tiles=96)),
            ("bm128 M=64 K=28", dict(k_tiles=28, m_tiles=64, bm=128)),
        )),
    ):
        hb = load_hier_bank(path)
        true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
        lap(f"bank {tag} loaded + truth ready")
        for sub, kw in cfgs:
            got = np.asarray(hier_topk(q, q_xyz, hb, **kw))
            rec = float((got == true).mean())
            ms = t(hier_topk, q, q_xyz, hb, **kw)
            lap(f"T2 {tag} {sub}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s  "
                f"recall {rec:.4f}")
        del hb


if __name__ == "__main__":
    main()
