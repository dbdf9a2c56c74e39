"""Measure the round-4 fused combine+concat epilogue on the flagship bank:
e2e apply (now routing concat through the kernel) + direct retrieve_hier
with/without concat_query."""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval_hier import retrieve_hier

    print("device:", jax.devices()[0])
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model(
        "RANGE+", db_path=bank, beta=0.5, profile="flagship", chunk=4096,
        compute_dtype=jnp.float32, seed=0,
        hier_cache="/tmp/range_bench_hier_cache.npz")
    hb = enc.extra
    rng = np.random.default_rng(0)
    B = 10_000
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)

    fn = jax.jit(enc._apply3)
    out = fn(enc.params, coords, hb)
    assert out.shape == (B, 1280), out.shape
    e2e = C.timeit(fn, enc.params, coords, hb, iters=50)
    print(f"e2e apply (fused combine): {e2e:6.2f} ms "
          f"({B/e2e*1e3/1e6:.2f}M q/s)")

    twr = jax.jit(enc.model.query_embedding)
    q = jnp.asarray(np.asarray(twr(enc.params, coords)))
    q_xyz = lonlat_deg_to_xyz(coords)
    kw = dict(k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)
    t0 = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, **kw)
    t1 = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, concat_query=q,
                  **kw)
    print(f"retrieve_hier:             {t0:6.2f} ms (XLA combine, no cat)")
    print(f"retrieve_hier+concat fused:{t1:6.2f} ms (kernel combine+cat)")

    # sanity: fused output equals XLA combine + concat
    ref = np.asarray(retrieve_hier(q, q_xyz, hb, **kw))
    got = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q, **kw))
    rel = np.abs(got[:, :1024] - ref) / np.maximum(np.abs(ref), 1e-1)
    print(f"fused vs XLA maxrel: {rel.max():.3g}  "
          f"q-cols exact: {np.array_equal(got[:, 1024:], np.asarray(q))}")


if __name__ == "__main__":
    main()
