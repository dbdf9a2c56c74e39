from _tpu_common import standard_fixture, jax, jnp, np
import time
t0=time.time()
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import build_hier_bank, hier_nn, retrieve_hier, hier_topk
bank, q, q_xyz = standard_fixture(b=10_240)
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
print(f"[{time.time()-t0:.0f}s] setup", flush=True)
for BB, bm, K in ((2048, 128, 16), (2048, 128, 24), (1024, 128, 24)):
    nn = np.asarray(hier_nn(q[:BB], q_xyz[:BB], hb, k_tiles=K, bm=bm))
    print(f"hier_nn B={BB} bm={bm} K={K}: recall {(nn==true[:BB]).mean():.4f}", flush=True)
ref = retrieve(q[:2048], q_xyz[:2048], hb.bank, sem_temp=12.0, geo_temp=40.0, beta=0.5, chunk=4096)
out = retrieve_hier(q[:2048], q_xyz[:2048], hb, bm=128, k_tiles=24)
rel = np.abs(np.asarray(out)-np.asarray(ref))/np.maximum(np.abs(np.asarray(ref)),1e-1)
print(f"relerr B=2048 bm=128 K=24: mean {rel.mean():.4f}", flush=True)
tk = np.asarray(hier_topk(q[:2048], q_xyz[:2048], hb, bm=128))
print(f"topk B=2048 bm=128 K=56: recall {(tk==true[:2048]).mean():.4f}", flush=True)
print(f"[{time.time()-t0:.0f}s] DONE", flush=True)
