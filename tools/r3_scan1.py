import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Scan-kernel perf battery (round 3): vectorized per-tile stat reductions
(replacing the 4*tc strided slice loop) + the new decoupled `scan_bm`
(stats/tails are per-query, so the scan's query block is a pure perf knob:
group-operand HBM traffic scales as Bp/scan_bm).  Sweeps scan_bm x tc on
the flagship geometry, then e2e retrieve_hier with the best."""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval_hier import (_hier_scan_call, _pad_queries,
                                          retrieve_hier)
from range_tpu.ops.retrieval_pallas import pack_queries

B = 10_240
BM, K, JS, KG = 128, 32, 3, 16


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
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               seed=0, chunk=4096, lr_rank=256,
                               k_tiles=K, j_sem=JS, k_geo=KG,
                               hier_cache="/tmp/r3t_lr256.npz")
    hb = enc.extra
    lap(f"bank ready t_real={hb.t_real} t_pad={hb.t_pad} lr={hb.lr_rank}")

    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    tow = jax.jit(lambda c: tower.apply(tp, c))
    q = tow(coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)

    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    sem_vw = hb.g_sem_vw_lr if hb.g_sem_vw_lr is not None else hb.g_sem_vw

    for sbm in (128, 256, 512):
        for tc in (8, 16):
            try:
                ms = t(_hier_scan_call, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                       sem_vw, hb.g_geo_vw, bm=sbm, tc=tc,
                       gpt_s=gpt_s, gpt_g=gpt_g)
                lap(f"scan bm={sbm} tc={tc}: {ms:.2f} ms")
            except Exception as e:
                lap(f"scan bm={sbm} tc={tc}: FAIL {str(e)[:120]}")

    # e2e with the best scan_bm (and the flagship asym config)
    for bm in (128, 256):
        for sbm in (None, 256, 512):
            for tc in (16,):
                try:
                    ms = t(retrieve_hier, q, q_xyz, hb, k_tiles=K, bm=bm,
                           tc=tc, j_sem=JS, k_geo=KG, scan_bm=sbm)
                    lap(f"e2e K={K} kg={KG} bm={bm} tc={tc} scan_bm={sbm}: "
                        f"{ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")
                except Exception as e:
                    lap(f"e2e bm={bm} scan_bm={sbm}: FAIL {str(e)[:120]}")
    from range_tpu.ops.retrieval_hier import hier_topk
    for bm in (128, 256):
        ms = t(hier_topk, q, q_xyz, hb, k_tiles=40, bm=bm)
        lap(f"hier_topk K=40 bm={bm}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")


if __name__ == "__main__":
    main()
