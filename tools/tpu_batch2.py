"""TPU batch: hier_topk recall + throughput on the 100k informative bank."""
import functools
import time

from _tpu_common import standard_fixture, jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf[:1].astype(jnp.float32)))


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


from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import build_hier_bank, hier_topk, retrieve_hier

B = 10_240
bank, q, q_xyz = standard_fixture(b=B)
lap("fixture")
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hier bank")
true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
lap("exact NN")

for K, js, mode in ((40, 4, "range"), (40, 6, "range"), (56, 6, "range"),
                    (40, 4, "range+"), (64, 8, "range"), (80, 8, "range")):
    f = functools.partial(hier_topk, k_tiles=K, j_sem=js, mode=mode, bm=256)
    got = np.asarray(f(q, q_xyz, hb))
    rec = (got == true).mean()
    ms = t(f, q, q_xyz, hb)
    print(f"hier_topk K={K} j={js} mode={mode}: recall@1={rec:.4f}  "
          f"{ms:.2f} ms ({B/ms*1000:,.0f} q/s)", flush=True)
lap("topk sweep done")

# feature path reference numbers in the same process
f = functools.partial(retrieve_hier, k_tiles=16, bm=256, tc=8, j_sem=2,
                      j_geo=2)
ms = t(f, q, q_xyz, hb)
print(f"retrieve_hier K=16: {ms:.2f} ms ({B/ms*1000:,.0f} q/s)", flush=True)
lap("ALL DONE")
