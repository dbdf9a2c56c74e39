"""Small-batch recall for the hier_topk SERVING endpoint (VERDICT r3 #4).

The feature path auto-widens its selection budget below B=8192
(models/range_encoder.py); hier_topk has only been recall-measured at
B=10,240.  This measures recall@1 at B in {512, 2048, 10240} on the
flagship bank for (a) the fixed bench config (K=48, bm=256) and (b)
widened/shrunk-bm variants, to calibrate the auto-policy.
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    # NO load_model here: mixing the full flagship encoder with extra
    # component-level jits in one process crashes the tunnel worker
    # (PERF.md round 3; reproduced twice at this exact spot in round 4)
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import hier_topk, prepare_hier_bank

    print("device:", jax.devices()[0])
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                           lr_rank=256, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/range_bench_hier_cache.npz")
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    def twr(_, coords):
        q = tower.apply(tp, coords)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    enc = None

    rng = np.random.default_rng(7)
    for B in (512, 2048, 10_240):
        coords = jnp.asarray(np.stack(
            [rng.uniform(-180, 180, B),
             np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
        q = jnp.asarray(np.asarray(twr(None, coords)).astype(np.float32))
        q_xyz = lonlat_deg_to_xyz(coords)
        true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
        for tag, kw in (
            ("K48 bm256 NO widen", dict(k_tiles=48, auto_widen=False)),
            ("K48 auto-widen (ship)", dict(k_tiles=48)),
        ):
            got = np.asarray(hier_topk(q, q_xyz, hb, **kw))
            rec = float((got == true).mean())
            ms = C.timeit(hier_topk, q, q_xyz, hb, iters=50, **kw)
            print(f"B={B:6d} {tag:24s} recall@1 {rec:.4f}  {ms:5.2f} ms "
                  f"({B/ms*1e3/1e6:.2f}M q/s)", flush=True)


if __name__ == "__main__":
    main()
