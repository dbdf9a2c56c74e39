"""Round 5, exp 3: 4M-row MESH-distributed bank build (VERDICT r4 #7).

Runs `build_hier_bank_mesh` on the 8-way virtual CPU mesh at 4,194,304 rows
(flagship-like knobs, Dv=128 to keep the host-RAM footprint CI-friendly),
then validates the built bank end-to-end: sharded_retrieve_hier at a
partial per-shard budget against the exact dense reference on a query
sample.  Records wall-clock per stage; the result lands in PERF.md round 5.

Forces CPU so it can run beside TPU experiments (the build path itself is
device-agnostic SPMD — on a real v5e pod slice the same program shards the
rows over ICI instead of virtual host devices).
"""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np

import _tpu_common  # noqa: F401  (sys.path setup only)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from jax.sharding import Mesh

    from range_tpu.bank.bank import GeoBank
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.ops.retrieval import retrieve
    from range_tpu.ops.retrieval_hier import build_hier_bank_mesh
    from range_tpu.parallel.sharded import sharded_retrieve_hier

    N = 4_194_304
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})",
          flush=True)
    t0 = time.time()
    # synthetic bank at 4M rows: i.i.d. keys are fine here — this measures
    # the BUILD pipeline, not retrieval fidelity (the informative generator
    # runs the full tower over 4M points: minutes of pure fixture cost)
    bank = GeoBank.synthetic_device(0, N, key_dim=256, value_dim=128,
                                    pad_to=4096)
    print(f"fixture: {time.time()-t0:.0f}s  bank {bank.values.shape}",
          flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("bank",))
    t1 = time.time()
    hb = build_hier_bank_mesh(bank, mesh, bn=512, gsz_sem=16, gsz_geo=64,
                              lr_rank=128, lr_geo=128, res_rank=128,
                              topk_gsz=8, seed=0)
    t2 = time.time()
    print(f"mesh build: {t2-t1:.0f}s  t_real={hb.t_real} t_pad={hb.t_pad} "
          f"(per-shard slab {hb.t_pad//8} tiles)", flush=True)

    # serve a regional query sample and compare against the exact dense
    # reference restricted to the same bank
    rng = np.random.default_rng(3)
    B = 1024
    qi = rng.integers(0, N, 8)
    locs = np.asarray(hb.bank.locs_lonlat)[np.repeat(qi, B // 8)] \
        + rng.normal(0, 2.0, (B, 2))
    locs[:, 0] = (locs[:, 0] + 180) % 360 - 180
    locs[:, 1] = np.clip(locs[:, 1], -89.0, 89.0)
    q = rng.standard_normal((B, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    q_xyz = lonlat_deg_to_xyz(jnp.asarray(locs, jnp.float32))
    t3 = time.time()
    out = np.asarray(sharded_retrieve_hier(
        q, q_xyz, hb, mesh, k_tiles=8, k_geo=4, j_sem=3, bm=128, tc=8,
        interpret=True))
    t4 = time.time()
    ref = np.asarray(retrieve(q, q_xyz, hb.bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=4096))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
    print(f"serve (virtual 8-mesh, K=8/shard): {t4-t3:.0f}s  "
          f"relerr mean {rel.mean()*100:.2f}% p99 "
          f"{np.percentile(rel, 99)*100:.2f}%", flush=True)
    print(f"TOTAL build wall-clock at 4M rows: {t2-t1:.0f}s", flush=True)


if __name__ == "__main__":
    main()
