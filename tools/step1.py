import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
from range_tpu.bank.bank import GeoBank
from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier

t0 = time.perf_counter()
bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096, value_dtype=jnp.bfloat16)
print(f"bank: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
print(f"build_hier_bank: {time.perf_counter()-t0:.1f}s T={hb.t_real} t_pad={hb.t_pad}", flush=True)
t0 = time.perf_counter()
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
rng = np.random.default_rng(1)
B = 10240
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B), np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)
print(f"queries: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = retrieve_hier(q, q_xyz, hb, k_tiles=16, bm=256, tc=8)
_ = float(jnp.sum(out[:1,:1]))
print(f"retrieve_hier compile+run: {time.perf_counter()-t0:.1f}s out={out.shape}", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    out = retrieve_hier(q, q_xyz, hb, k_tiles=16, bm=256, tc=8)
_ = float(jnp.sum(out[:1,:1]))
print(f"steady: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
