"""Round 5: measure turbo's e2e throughput (VERDICT r4 weak #2 — the
RESULTS.md PROFILES row carried an estimate, "~2.8M (est: +0.73 ms
tower)"; every other cell is measured).  One process, the real serving
path: load_model(profile='turbo') end-to-end at B=10,000 on the chip."""
import time

import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    import range_tpu
    from range_tpu.bank.bank import GeoBank

    print("device:", jax.devices()[0], flush=True)
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model(
        "RANGE+", db_path=bank, profile="turbo", chunk=4096, seed=0,
        hier_cache="/tmp/range_bench_hier_cache.npz")
    rng = np.random.default_rng(0)
    B = 10_000
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    fn = jax.jit(enc._apply3)
    out = fn(enc.params, coords, enc.extra)
    C.fence(out)
    print("out", out.shape, flush=True)
    ms = C.timeit(fn, enc.params, coords, enc.extra, iters=50)
    print(f"turbo e2e (tower + retrieval, B={B}): {ms:.2f} ms "
          f"= {B/ms*1e3/1e6:.2f}M q/s", flush=True)


if __name__ == "__main__":
    main()
