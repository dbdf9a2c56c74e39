"""Round-4 geo low-rank tail experiment: does lr_geo cut the scan's geo
tail cost without hurting feature fidelity?  (The geo family is sharply
local — its tail mass is small — but the checker probe leans on the geo
blend, so relerr must stay flat before the profile adopts it.)

No load_model in this process (full-encoder + component jits crashes the
tunnel worker).
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import prepare_hier_bank, retrieve_hier

    print("device:", jax.devices()[0])
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    B = 10_240
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = jnp.asarray(np.asarray(
        q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32))
    q_xyz = lonlat_deg_to_xyz(coords)

    ref = np.asarray(retrieve(q, None, bank, sem_temp=12.0, geo_temp=40.0,
                              beta=0.5, chunk=4096, mode="range"))  # warm jit
    kw = dict(k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)

    banks = {}
    banks["flagship (no geo-lr)"] = prepare_hier_bank(
        bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, res_rank=128,
        topk_gsz=8, seed=0, cache_path="/tmp/range_bench_hier_cache.npz")
    for rg in (384, 256):
        banks[f"+ lr_geo={rg}"] = prepare_hier_bank(
            bank, bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256,
            lr_geo=rg, res_rank=128, topk_gsz=8, seed=0,
            cache_path=f"/tmp/r4_geolr{rg}.npz")
        print(f"built lr_geo={rg}", flush=True)

    # f32-exact dense reference for relerr (hier bank row order)
    hb0 = banks["flagship (no geo-lr)"]
    ref = np.asarray(retrieve(q, q_xyz, hb0.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=4096))

    for tag, hb in banks.items():
        # per-bank dense ref (row orders match across builds — same
        # clustering inputs — but recompute to be safe)
        refb = (ref if hb is hb0 else np.asarray(
            retrieve(q, q_xyz, hb.bank, sem_temp=12.0, geo_temp=40.0,
                     beta=0.5, chunk=4096)))
        out = np.asarray(retrieve_hier(q, q_xyz, hb, concat_query=q, **kw))
        rel = (np.abs(out[:, :1024] - refb)
               / np.maximum(np.abs(refb), 1e-1))
        ms = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      concat_query=q, **kw)
        # scan_bm=1024 only fits VMEM with a NARROW geo tail (the
        # full-width Wg=1025 scan block OOMs scoped vmem by 4 MB)
        if hb.lr_geo:
            ms1024 = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                              concat_query=q, k_tiles=32, j_sem=3, k_geo=16,
                              scan_bm=1024)
            extra = f"[scan_bm=1024: {ms1024:5.2f}] "
        else:
            extra = ""
        print(f"{tag:24s} {ms:5.2f} ms ({B/ms*1e3/1e6:.2f}M q/s) "
              f"{extra}relerr mean "
              f"{rel.mean():.4f} p99 {np.percentile(rel, 99):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
