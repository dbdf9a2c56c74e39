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
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.ops.retrieval_hier import hier_topk

    print("device:", jax.devices()[0])
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model(
        "RANGE+", db_path=bank, beta=0.5, profile="flagship", chunk=4096,
        compute_dtype=jnp.float32, seed=0,
        hier_cache="/tmp/range_bench_hier_cache.npz")
    hb = enc.extra
    twr = jax.jit(enc.model.query_embedding)

    rng = np.random.default_rng(7)
    for B in (512, 2048, 10_240):
        coords = jnp.asarray(np.stack(
            [rng.uniform(-180, 180, B),
             np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
        q = jnp.asarray(np.asarray(twr(enc.params, coords)))
        q_xyz = lonlat_deg_to_xyz(coords)
        true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
        for tag, kw in (
            ("K48 bm256 (bench cfg)", dict(k_tiles=48)),
            ("K48 bm128", dict(k_tiles=48, bm=128)),
            ("K96 bm128 j8", dict(k_tiles=96, bm=128, j_sem=8)),
            ("K144 bm128 j10", dict(k_tiles=144, bm=128, j_sem=10)),
        ):
            if B == 10_240 and "K144" in tag:
                continue
            got = np.asarray(hier_topk(q, q_xyz, hb, **kw))
            rec = float((got == true).mean())
            ms = C.timeit(hier_topk, q, q_xyz, hb, iters=50, **kw)
            print(f"B={B:6d} {tag:24s} recall@1 {rec:.4f}  {ms:5.2f} ms "
                  f"({B/ms*1e3/1e6:.2f}M q/s)", flush=True)


if __name__ == "__main__":
    main()
