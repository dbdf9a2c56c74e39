"""Round-4 lever: larger serving batches -> tighter sorted query blocks.

Per-query kernel work is ~linear in B, so q/s is roughly flat in B — EXCEPT
that (a) fixed per-call overheads amortize, and (b) at fixed bm=256 the
hybrid sort packs each block into a 3x smaller slice of the sort space at
B=32k than at B=10k, so a block's K selected tiles cover its queries
better.  If coherence improves enough, a SMALLER K holds the flagship's
fidelity — and parts cost is ~B*K.

Measures retrieval ms + relerr at B in {10240, 32768} x K in {32, 24, 20},
plus the topk endpoint recall at matching budgets.  Uses the lr_geo=384
flagship bank (shared cache with bench.py).
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval import exact_nn, retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import (hier_topk, prepare_hier_bank,
                                              retrieve_hier)

    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    print("device:", jax.devices()[0], flush=True)
    bank, _, _ = C.standard_fixture()
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256,
                           lr_geo=384, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/r4_geolr384.npz")
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    rng = np.random.default_rng(7)
    for B in (10_240, 32_768):
        locs = np.stack([rng.uniform(-180, 180, B),
                         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))],
                        1).astype(np.float32)
        # queries from the seeded SatCLIP tower (the honest-fidelity
        # generator, same as standard_fixture) so sem selection is real
        coords = jnp.asarray(locs)
        q = tower.apply(tp, coords)
        q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)
             ).astype(jnp.float32)
        q_xyz = lonlat_deg_to_xyz(coords)
        ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                      geo_temp=40.0, beta=0.5, chunk=4096))
        den = np.maximum(np.abs(ref), 1e-1)
        true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
        for K, kg in ((32, 16), (24, 12), (20, 10)):
            kw = dict(k_tiles=K, k_geo=kg, j_sem=3, bm=256, scan_bm=512)
            out = np.asarray(retrieve_hier(q, q_xyz, hb, **kw))
            rel = np.abs(out - ref) / den
            ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=40, **kw)
            print(f"B={B:6d} K{K}/kg{kg}: {ms:6.2f} ms "
                  f"({B/ms*1e3/1e6:.2f}M q/s) relerr mean "
                  f"{rel.mean()*100:5.2f}% p99 "
                  f"{np.percentile(rel, 99)*100:5.2f}%", flush=True)
        for K in (48, 40):
            got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=K))
            ms = C.timeit(hier_topk, q, q_xyz, hb, iters=40, k_tiles=K)
            print(f"B={B:6d} topk K{K}: recall@1 {(got == true).mean():.4f} "
                  f"{ms:6.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)", flush=True)


if __name__ == "__main__":
    main()
