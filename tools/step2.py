import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np, jax, jax.numpy as jnp
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier

bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096, value_dtype=jnp.bfloat16)
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
rng = np.random.default_rng(1)
B = 10240
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B), np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)

def t(fn, *a, iters=10):
    out = fn(*a); _ = float(jnp.sum(out[:1,:1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*a)
        _ = float(jnp.sum(out[:1,:1]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3

for kw in ({"sort_queries": False}, {"sort": "geo"}, {"sort": "hybrid"},
           {"sort": "geo", "tail": False}, ):
    f = functools.partial(retrieve_hier, k_tiles=20, bm=256, tc=8, j_sem=2, j_geo=4, **kw)
    print(f"{kw}: {t(f, q, q_xyz, hb):.2f} ms", flush=True)
