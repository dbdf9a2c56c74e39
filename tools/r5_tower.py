"""Round 5, exp 5: full-tower kernel timing (VERDICT r4 #8).

Times the SatCLIP L=40 location tower at B=10,240 on the real chip:
  * round-4 path: fused first layer (spherical_harmonics_times_pallas) +
    XLA for the remaining SIREN sines/matmuls;
  * round-5 path: the whole stack in one kernel (siren_tower_pallas);
f32 and bf16-matmul variants, plus embedding agreement between the two.
Target: tower <= 0.7 ms at cosine >= 0.9999 vs f32 (VERDICT #8 done bar).
"""
import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    from range_tpu.ops.sh import siren_tower_pallas

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B = 10_240
    ll = jnp.asarray(np.stack([rng.uniform(-180, 180, B),
                               rng.uniform(-90, 90, B)], 1), jnp.float32)
    enc = SatClipLocationEncoder(SatClipLocationConfig())
    params = enc.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    L = int(enc.posenc.legendre_polys)

    def old_path(p, x, md=None):
        from range_tpu.ops.sh import spherical_harmonics_times_pallas

        pre = spherical_harmonics_times_pallas(
            x, L, p["layers"][0]["w"], enc.posenc.convention,
            matmul_dtype=md)
        if "b" in p["layers"][0]:
            pre = pre + p["layers"][0]["b"]
        return enc.nnet.apply(p, x, first_preact=pre)

    def new_path(p, x, md=None):
        return siren_tower_pallas(x, L, p, enc.posenc.convention,
                                  matmul_dtype=md)

    # ONE variant per process: mixing several tower jits in one process
    # reliably crashes the tunneled TPU worker (verify skill note; the
    # 4-variant loop crashed it here too)
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "new f32"
    fn = old_path if name.startswith("old") else new_path
    md = jnp.bfloat16 if name.endswith("bf16") else None
    f = jax.jit(lambda p, x: fn(p, x, md))
    out = np.asarray(f(params, ll))
    assert np.isfinite(out).all()
    ms = C.timeit(f, params, ll, iters=60)
    print(f"{name:10s} {ms:5.2f} ms ({B/ms*1e3/1e6:.2f}M q/s)", flush=True)


if __name__ == "__main__":
    main()
