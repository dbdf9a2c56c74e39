"""Benchmark: RANGE+ end-to-end query throughput on one TPU chip.

Measures the flagship inference path (SatCLIP SH-L40/SIREN query tower +
exact dual-softmax retrieval over a 100k-row bank, batch 10k — the
reference's recommended operating point, Readme.md:84-94) steady-state and
on-device: inputs are device-resident, outputs block_until_ready, no host
transfers inside the timed region.

Prints ONE JSON line:
  {"metric": "range_plus_query_throughput", "value": <locs/sec/chip>,
   "unit": "queries/s", "vs_baseline": <value / 10M target>}

BASELINE.md north-star target: >= 10M query locations/sec/chip on v5e.
Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import range_tpu

    dev = jax.devices()[0]
    log(f"device: {dev} backend: {jax.default_backend()}")

    BANK_N = 100_000
    BATCH = 10_000

    from range_tpu.bank.bank import GeoBank

    # production serving config: bf16 values (weighted averaging smooths the
    # value rounding to <1%), f32 bank keys, 'fast' kernel tier
    bank = GeoBank.synthetic_device(0, BANK_N, pad_to=4096,
                                    value_dtype=jnp.bfloat16)
    enc = range_tpu.load_model(
        "RANGE+",
        db_path=bank,
        beta=0.5,
        chunk=4096,
        compute_dtype=jnp.float32,
        seed=0,
    )
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        np.stack([rng.uniform(-180, 180, BATCH), rng.uniform(-90, 90, BATCH)], 1),
        jnp.float32,
    )
    coords = jax.device_put(coords, dev)

    fn = jax.jit(enc._apply3)
    t0 = time.perf_counter()
    out = fn(enc.params, coords, enc.extra)
    # NOTE: on the tunneled device block_until_ready can return before the
    # work is actually done; a scalar fetch is the only reliable fence.
    _ = float(jnp.sum(out))
    t1 = time.perf_counter()
    log(f"first call (compile+run): {t1 - t0:.1f}s; out {out.shape} {out.dtype}")

    # steady state: K dispatches, fenced by one scalar fetch at the end;
    # best of 3 rounds (the shared tunneled chip shows ~10% run-to-run noise)
    iters = 10
    _ = float(jnp.sum(fn(enc.params, coords, enc.extra)))  # warm
    per_call = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(enc.params, coords, enc.extra)
        _ = float(jnp.sum(out))
        per_call = min(per_call, (time.perf_counter() - t0) / iters)
    throughput = BATCH / per_call
    log(f"steady-state: {per_call*1e3:.2f} ms/call -> {throughput:,.0f} queries/s")

    # fidelity diagnostics (stderr): retrieval quality of the serving config
    try:
        from range_tpu.ops.retrieval import retrieve as retrieve_ref
        from range_tpu.ops.retrieval import exact_nn
        from range_tpu.ops.topk import recall_at_k, topk_sem

        q_small = enc.model.query_embedding(enc.params, coords[:2048])
        from range_tpu.geometry import lonlat_deg_to_xyz

        q_xyz = lonlat_deg_to_xyz(coords[:2048])
        true = exact_nn(q_small, bank, chunk=8192)
        _, cand = topk_sem(q_small, bank, k=1, chunk=8192)
        log(f"recall@1 (f32 top-k vs exact NN): {recall_at_k(cand, true):.4f}")
        ref = retrieve_ref(q_small, q_xyz, bank, sem_temp=12.0, geo_temp=40.0,
                           beta=0.5, chunk=4096)
        fused = out[:2048, :1024]
        import numpy as _np

        rel = _np.abs(_np.asarray(fused) - _np.asarray(ref)) / _np.maximum(
            _np.abs(_np.asarray(ref)), 1e-1)
        log(f"fused-vs-exact retrieval maxrelerr: {rel.max():.5f}")
    except Exception as e:  # diagnostics never fail the bench
        log(f"fidelity diagnostics skipped: {e}")

    print(json.dumps({
        "metric": "range_plus_query_throughput",
        "value": round(throughput, 1),
        "unit": "queries/s",
        "vs_baseline": round(throughput / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
