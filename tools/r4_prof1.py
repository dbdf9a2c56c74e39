"""Round-4 e2e decomposition, API level only (no component jits — mixing
them with the full encoder crashes the tunnel worker; PERF.md round 3).

Times on the flagship bank (from the bench cache when present):
  e2e apply | tower alone | retrieve_hier alone | e2e-sum = glue
plus hier_topk and the unsorted retrieval variant (sort/permute cost).
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval_hier import hier_topk, retrieve_hier

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
    e2e = C.timeit(fn, enc.params, coords, hb, iters=50)
    print(f"e2e apply:               {e2e:6.2f} ms  ({B/e2e*1e3/1e6:.2f}M q/s)")

    twr = jax.jit(enc.model.query_embedding)
    t_twr = C.timeit(twr, enc.params, coords, iters=60)
    print(f"tower (embed+norm):      {t_twr:6.2f} ms")

    q = twr(enc.params, coords)
    q = jnp.asarray(np.asarray(q))  # device-resident, detached
    q_xyz = lonlat_deg_to_xyz(coords)

    kw = dict(k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)
    t_ret = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50, **kw)
    print(f"retrieve_hier flagship:  {t_ret:6.2f} ms")
    t_ret_ns = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                        sort_queries=False, **kw)
    print(f"  ... sort_queries=False:{t_ret_ns:6.2f} ms (sort+permute delta "
          f"{t_ret - t_ret_ns:+.2f})")

    t_tk = C.timeit(hier_topk, q, q_xyz, hb, iters=50, k_tiles=48)
    print(f"hier_topk K=48:          {t_tk:6.2f} ms  "
          f"({10_240/t_tk*1e3/1e6:.2f}M q/s)")

    glue = e2e - t_twr - t_ret
    print(f"GLUE (e2e - tower - retrieval): {glue:+.2f} ms")


if __name__ == "__main__":
    main()
