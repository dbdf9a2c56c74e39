"""Round-4: 1M-row bank on one chip — host-staged build + serving numbers.

VERDICT r3 #5: the device build OOM'd 16 GB HBM at 1M rows (~3 transient
bank copies); `build_hier_bank(host_stage=True)` stages through host RAM.
This measures the full story on the real chip: build wall time, serving
retrieval throughput/fidelity at the flagship config, and the topk
endpoint recall, at 1,048,576 rows x 1024-d values (bf16 bank ~2.1 GB +
operands).

The tail_super lever is also probed here: at 1M rows t_pad is ~10x the
100k bench (the scan scales with tile count, the parts stay K-bounded),
which is the regime the 100k measurement said it could win in.
"""
import time

import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import (hier_topk, prepare_hier_bank,
                                              retrieve_hier)

    print("device:", jax.devices()[0], flush=True)
    N, B = 1_048_576, 10_240
    bank = GeoBank.synthetic_informative(0, N, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = jnp.asarray(np.asarray(
        q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32))
    q_xyz = lonlat_deg_to_xyz(coords)
    print(f"bank {N} rows ready", flush=True)

    t0 = time.time()
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256,
                           lr_geo=384, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/r4_1m_cache.npz")
    print(f"1M flagship build (host-staged auto): {time.time()-t0:.1f}s "
          f"(t_real={hb.t_real}, t_pad={hb.t_pad})", flush=True)

    # serving knobs: selection budget scales ~log with rows (400k used
    # K=64); probe two budgets
    for K, kg, j in ((48, 24, 3), (64, 32, 3)):
        kw = dict(k_tiles=K, k_geo=kg, j_sem=j, scan_bm=512)
        out = retrieve_hier(q, q_xyz, hb, **kw)
        C.fence(out)
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=30, **kw)
        print(f"retrieval K{K}/kg{kg}/j{j}: {ms:6.2f} ms "
              f"({B/ms*1e3/1e6:.2f}M q/s)", flush=True)

    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
    for K in (64, 96):
        got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=K))
        ms = C.timeit(hier_topk, q, q_xyz, hb, iters=30, k_tiles=K)
        print(f"hier_topk K{K}: recall@1 {(got == true).mean():.4f} "
              f"{ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)", flush=True)

    # tail_super at scale: the scan is ~10x the 100k bench here
    t0 = time.time()
    hb_ts = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                              lr_rank=256, lr_geo=384, res_rank=128,
                              topk_gsz=8, tail_super=128, seed=0,
                              cache_path="/tmp/r4_1m_ts_cache.npz")
    print(f"1M tail_super=128 build: {time.time()-t0:.1f}s", flush=True)
    for K, m in ((48, 0), (48, 48)):
        kw = dict(k_tiles=K, k_geo=24, j_sem=3, scan_bm=512, m_corr=m)
        out = retrieve_hier(q, q_xyz, hb_ts, **kw)
        C.fence(out)
        ms = C.timeit(retrieve_hier, q, q_xyz, hb_ts, iters=30, **kw)
        print(f"ts128 K{K}/m{m}: {ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)",
              flush=True)


if __name__ == "__main__":
    main()
