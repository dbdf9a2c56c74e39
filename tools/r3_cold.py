import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Cold-start diagnostic (VERDICT r2 weak #7): fresh process, warm
persistent compile cache + prebuilt hier_cache — where do the startup
seconds go?  Run AFTER r3_time1.py (which populates both caches)."""
import time

T0 = time.time()


def lap(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


from _tpu_common import jax, jnp, np  # noqa: E402

lap("jax imported + device attached")

import range_tpu  # noqa: E402
from range_tpu.bank.bank import GeoBank  # noqa: E402

bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                     value_dtype=jnp.bfloat16)
lap("bank generated (on device)")

enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                           hier_cache="/tmp/r3t_lr256.npz",  # r3_final1's build (same signature)
                           k_tiles=32, j_sem=3, k_geo=16, lr_rank=256,
                           hier_scan_bm=512, chunk=4096)
lap("load_model (hier_cache)")

rng = np.random.default_rng(0)
coords = np.stack([rng.uniform(-180, 180, 10_240),
                   np.degrees(np.arcsin(rng.uniform(-1, 1, 10_240)))],
                  1).astype(np.float32)
out = enc(coords)
s = float(jnp.sum(jnp.asarray(out).reshape(-1)[:1]))
lap("first call (compile+run)")
out = enc(coords)
s = float(jnp.sum(jnp.asarray(out).reshape(-1)[:1]))
lap("second call")
