import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Sweep hier v2 knobs on the real TPU at the SERVING batch size."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import build_hier_bank, hier_nn, retrieve_hier
from range_tpu.ops.topk import recall_at_k

BANK_N = 100_000
B = 10_240


def fence(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1].astype(jnp.float32)))


def t(fn, *a, iters=10):
    fence(fn(*a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                     value_dtype=jnp.bfloat16)
rng = np.random.default_rng(1)
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B),
                               np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1),
                     jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)

_cache = {}


def get_hb(bn, gsz_sem, gsz_geo):
    k = (bn, gsz_sem, gsz_geo)
    if k not in _cache:
        _cache.clear()
        _cache[k] = build_hier_bank(bank, bn=bn, gsz_sem=gsz_sem,
                                    gsz_geo=gsz_geo, tier="fast", seed=0)
        tr = exact_nn(q, _cache[k].bank, chunk=4096)
        ref = retrieve(q, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                       beta=0.5, chunk=4096)
        _cache["true"] = np.asarray(tr)
        _cache["ref"] = np.asarray(ref)
    return _cache[k], _cache["true"], _cache["ref"]


def run(bn, gsz_sem, gsz_geo, k_tiles, bm, tc, j_sem, j_geo):
    hb, true, ref = get_hb(bn, gsz_sem, gsz_geo)
    f = functools.partial(retrieve_hier, k_tiles=k_tiles, bm=bm, tc=tc,
                          j_sem=j_sem, j_geo=j_geo)
    ms = t(f, q, q_xyz, hb) * 1e3
    nn = hier_nn(q, q_xyz, hb, k_tiles=k_tiles, bm=bm, tc=tc,
                 j_sem=j_sem, j_geo=j_geo)
    rec = recall_at_k(np.asarray(nn)[:, None], true)
    out = np.asarray(f(q, q_xyz, hb))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    print(f"bn={bn} gsz=({gsz_sem},{gsz_geo}) K={k_tiles} bm={bm} tc={tc} "
          f"j=({j_sem},{j_geo}): {ms:.2f} ms ({B/ms*1000:,.0f} q/s) "
          f"recall@1={rec:.4f} relerr mean={rel.mean():.4f} p99="
          f"{np.percentile(rel, 99):.4f}", flush=True)


if __name__ == "__main__":
    for cfg in eval(sys.argv[1]):
        run(*cfg)
