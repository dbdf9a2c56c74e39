"""Pruned/hybrid vs dense on the INFORMATIVE bank (VERDICT r1 #4 tail)."""
from _tpu_common import standard_fixture, jax, jnp, np
import functools, time
t0 = time.time()
from range_tpu.bank.clustered import cluster_bank, compute_tile_plan
from range_tpu.ops.retrieval_pallas import (retrieve_pallas, retrieve_pruned,
                                            retrieve_hybrid)

def fence(out):
    return float(jnp.sum(out[:1, :1].astype(jnp.float32)))
def t(fn, *a, iters=10):
    fence(fn(*a))
    best = float("inf")
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        fence(out)
        best = min(best, (time.perf_counter() - s) / iters)
    return best * 1e3

B = 10_240
bank, q, q_xyz = standard_fixture(b=B)
print(f"[{time.time()-t0:.0f}s] fixture", flush=True)
cb, stats = cluster_bank(bank, bn=1024)
print(f"[{time.time()-t0:.0f}s] clustered ({cb.num_rows} rows)", flush=True)

ms = t(functools.partial(retrieve_pallas, bm=256, bn=1024), q, q_xyz, cb)
print(f"dense (clustered bank): {ms:.2f} ms ({B/ms*1000:,.0f} q/s)", flush=True)

# prune fractions on the autocorrelated bank
_, cnt_s = compute_tile_plan(q, stats.sem_centroid, stats.sem_radius,
                             temp=12.0, bm=256)
_, cnt_g = compute_tile_plan(q_xyz, stats.geo_centroid, stats.geo_radius,
                             temp=40.0, bm=256)
T = stats.sem_radius.shape[0]
print(f"tile-plan keep fraction: sem {float(jnp.mean(cnt_s))/T:.3f}  "
      f"geo {float(jnp.mean(cnt_g))/T:.3f} (of {T} tiles)", flush=True)

ms = t(functools.partial(retrieve_pruned, bm=256, bn=1024), q, q_xyz, cb, stats)
print(f"pruned: {ms:.2f} ms ({B/ms*1000:,.0f} q/s)", flush=True)
ms = t(functools.partial(retrieve_hybrid, bm=256, bn=1024), q, q_xyz, cb, stats)
print(f"hybrid: {ms:.2f} ms ({B/ms*1000:,.0f} q/s)", flush=True)
print(f"[{time.time()-t0:.0f}s] DONE", flush=True)
