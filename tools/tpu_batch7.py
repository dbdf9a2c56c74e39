"""Dense autotune re-sweep with unclamped Mosaic probing (VERDICT r1 #8)."""
from _tpu_common import standard_fixture, jax, jnp, np
import time
t0 = time.time()
from range_tpu.ops.autotune import autotune_retrieve, _CACHE
import logging
logging.basicConfig(level=logging.INFO)

bank, q, q_xyz = standard_fixture(b=10_240)
print(f"[{time.time()-t0:.0f}s] fixture", flush=True)
best = autotune_retrieve(q, q_xyz, bank, tier="fast", repeats=5)
print("best (bm, bn):", best, flush=True)
print(f"[{time.time()-t0:.0f}s] DONE", flush=True)
