"""Final hier knob sweep: tc, gsz_geo, bn variants at serving geometry."""
from _tpu_common import standard_fixture, jax, jnp, np
import functools, time
t0 = time.time()
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import build_hier_bank, retrieve_hier, hier_nn

def fence(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1].astype(jnp.float32)))

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
ref = np.asarray(retrieve(q[:4096], q_xyz[:4096], bank, sem_temp=12.0,
                          geo_temp=40.0, beta=0.5, chunk=4096))
cfgs = [
    (512, 8, 64, 16, 256, 8),
    (512, 8, 64, 16, 256, 16),
    (512, 8, 64, 16, 256, 32),
    (512, 8, 128, 16, 256, 8),
    (1024, 8, 64, 8, 256, 8),
]
hb_cache = {}
for bn, gs, gg, K, bm, tc in cfgs:
    key = (bn, gs, gg)
    if key not in hb_cache:
        hb_cache.clear()
        hb_cache[key] = build_hier_bank(bank, bn=bn, gsz_sem=gs, gsz_geo=gg,
                                        tier="fast", seed=0)
    hb = hb_cache[key]
    f = functools.partial(retrieve_hier, k_tiles=K, bm=bm, tc=tc)
    ms = t(f, q, q_xyz, hb)
    out = np.asarray(f(q[:4096], q_xyz[:4096], hb))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    print(f"bn={bn} gsz=({gs},{gg}) K={K} tc={tc}: {ms:.2f} ms "
          f"({B/ms*1000:,.0f} q/s) relerr {rel.mean():.4f}", flush=True)
print(f"[{time.time()-t0:.0f}s] DONE", flush=True)
