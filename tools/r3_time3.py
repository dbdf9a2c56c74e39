import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Throughput of the parity-winning asym configs (kg16 class) on the
informative 100k bank — the flagship must hold >= ~1M q/s AT the config
that meets the probe bar (VERDICT r2 #2: one config, all three bars)."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp, standard_fixture

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.ops.retrieval import retrieve
from range_tpu.ops.retrieval_hier import hier_topk, retrieve_hier

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
    bank, q, q_xyz = standard_fixture(b=B)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               seed=0, chunk=4096, lr_rank=256,
                               hier_cache="/tmp/r3t_lr256.npz")
    hb = enc.extra
    nref = 2048
    ref = np.asarray(retrieve(q[:nref], q_xyz[:nref], bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=4096))
    lap("bank + reference ready")

    for tag, kw in (
            ("K32-j3-kg4 (old flagship)", dict(k_tiles=32, j_sem=3, k_geo=4)),
            ("K32-j3-kg16", dict(k_tiles=32, j_sem=3, k_geo=16)),
            ("K40-j3-kg16", dict(k_tiles=40, j_sem=3, k_geo=16)),
            ("K48-j4-kg16", dict(k_tiles=48, j_sem=4, k_geo=16)),
    ):
        for bm in (128, 256):
            ms = t(retrieve_hier, q, q_xyz, hb, bm=bm, **kw)
            out = np.asarray(retrieve_hier(q[:nref], q_xyz[:nref], hb,
                                           bm=128, **kw))
            r = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
            lap(f"TIME {tag} bm={bm}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s "
                f"relerr mean {r.mean():.4f} p99 "
                f"{np.quantile(r, 0.99):.4f}")

    ms = t(hier_topk, q, q_xyz, hb, k_tiles=40, bm=128)
    lap(f"TIME hier_topk K=40: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")


if __name__ == "__main__":
    main()
