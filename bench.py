"""Benchmark: RANGE+ end-to-end query throughput on one TPU chip.

Measures the flagship serving path end-to-end and on-device (inputs device-
resident, scalar-fetch fence, no host transfers in the timed region):
SatCLIP SH-L40/SIREN query tower + HIERARCHICAL retrieval
(ops/retrieval_hier.py: exact dual softmax over selected bank tiles +
group-centroid tail) over a 100k-row bank at batch 10k — the reference's
recommended operating point (Readme.md:84-94).

The bank is the INFORMATIVE generator (keys = the seeded SatCLIP tower's
embeddings of the bank locations — spatially autocorrelated like a real
range_db, RESULTS.md), not i.i.d. Gaussian: retrieval fidelity numbers on
white noise are vacuous (round-1 verdict).

Fidelity is measured, not assumed (stderr diagnostics):
  * recall@1 of the SERVING top-k endpoint (`hier_topk`, hi/lo ~f32 logits
    over big-K selected tiles) vs HIGHEST-precision f32 exact NN
    — BASELINE.md's >= 0.999 bar;
  * recall@1 reachable by the hier FEATURE path (`hier_nn`, serving-tier
    packed logits restricted to its selected tiles) — a diagnostic that can
    be (and is) < 1;
  * feature error of the hier path vs the f32-exact dense computation;
  * the exact dense fused-kernel path's throughput for comparison.

Prints ONE JSON line:
  {"metric": "range_plus_query_throughput", "value": <locs/sec/chip>,
   "unit": "queries/s", "vs_baseline": <value / 10M target>}
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import range_tpu
    from range_tpu.bank.bank import GeoBank

    dev = jax.devices()[0]
    log(f"device: {dev} backend: {jax.default_backend()}")

    BANK_N = 100_000
    BATCH = 10_000

    bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    t_build = time.perf_counter()
    enc = range_tpu.load_model(
        "RANGE+",
        db_path=bank,
        beta=0.5,
        # the SHIPPED flagship profile (api.SERVING_PROFILES['flagship']):
        # joint key+value grouping (build default) + low-rank sem tail
        # (lr256) + low-rank geo tail (lr_geo384, round 4) + residual-rank
        # parts (res128 — the [bn, Dv] value matmul leaves the parts
        # kernels) + gsz_sem=16 scan + fine topk_gsz=8 top-k stats +
        # asymmetric budgets K32/j3/kg16 + scan_bm 512 + bf16 fused-tower
        # matmuls — the ONE config meeting throughput + recall + probe
        # parity, now probed with the truncations ACTIVE (Dv=1024 bank,
        # gap -0.0012; PERF.md rounds 3-4, RESULTS.md)
        profile="flagship",
        chunk=4096,
        compute_dtype=jnp.float32,
        seed=0,
        # bank prep (k-means + packing) is deterministic for this seed and
        # costs minutes over the tunnel — persist it like a real serving
        # deployment would; the stored build signature invalidates caches
        # built with other params
        hier_cache="/tmp/range_bench_hier_cache.npz",
    )
    log(f"load_model(retrieval='hier'): {time.perf_counter() - t_build:.1f}s")
    hb = enc.extra
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        np.stack([rng.uniform(-180, 180, BATCH),
                  np.degrees(np.arcsin(rng.uniform(-1, 1, BATCH)))], 1),
        jnp.float32,
    )
    coords = jax.device_put(coords, dev)

    fn = jax.jit(enc._apply3)
    t0 = time.perf_counter()
    out = fn(enc.params, coords, enc.extra)
    # NOTE: on the tunneled device block_until_ready can return before the
    # work is actually done; a scalar fetch is the only reliable fence.
    _ = float(jnp.sum(out[:1, :1]))
    t1 = time.perf_counter()
    log(f"first call (compile+run): {t1 - t0:.1f}s; out {out.shape} {out.dtype}")

    # steady state: K dispatches, fenced by one scalar fetch at the end;
    # best of 3 rounds (the shared tunneled chip shows ~10% run-to-run noise).
    # iters MUST be large: the tunnel's dispatch feed rate is ~3.5 ms/call
    # at 10-deep queues and only amortizes at ~50+ (measured: a trivial
    # kernel "costs" 3.55 ms/call at iters=10, 0.29 ms at 200) — shallow
    # loops measure the FEED RATE, not the device (round-3 finding; every
    # round-2 stage timing under ~4 ms was feed-limited)
    iters = 50
    _ = float(jnp.sum(fn(enc.params, coords, enc.extra)[:1, :1]))  # warm
    per_call = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(enc.params, coords, enc.extra)
        _ = float(jnp.sum(out[:1, :1]))
        per_call = min(per_call, (time.perf_counter() - t0) / iters)
    throughput = BATCH / per_call
    log(f"steady-state e2e (tower + hier retrieval): {per_call*1e3:.2f} ms/call"
        f" -> {throughput:,.0f} queries/s")

    # ---- fidelity (the whole point: these numbers CAN be < 1) ----
    # Machine-readable and falsifiable: the measured numbers land in the
    # final JSON line, and `fidelity_ok` flips false when the serving
    # recall misses the >= 0.999 bar OR the fidelity block throws — a
    # regression can no longer hide behind a green throughput number.
    fid = {"recall_at1": None, "feat_relerr_mean": None,
           "feat_relerr_p99": None, "fidelity_ok": False}
    try:
        from range_tpu.geometry import lonlat_deg_to_xyz
        from range_tpu.ops.retrieval import exact_nn, retrieve as retrieve_ref
        from range_tpu.ops.retrieval_hier import hier_nn, hier_topk

        nq = 10_240
        qc = jnp.asarray(
            np.stack([rng.uniform(-180, 180, nq),
                      np.degrees(np.arcsin(rng.uniform(-1, 1, nq)))], 1),
            jnp.float32)
        q = enc.model.query_embedding(enc.params, qc)
        q_xyz = lonlat_deg_to_xyz(qc)
        # ground truth: f32 HIGHEST-precision exact NN over the hier bank's
        # row order (ops/retrieval.exact_nn defaults to HIGHEST)
        true = np.asarray(exact_nn(q, hb.bank, chunk=4096))

        # serving top-k endpoint (the recall-critical path).  K=48 with
        # the fine topk_gsz=8 stats operand: recall 0.9994-0.9998 across
        # query seeds (the coarse gsz16 signal alone needed K=64)
        TOPK_K = 48
        got = np.asarray(hier_topk(q, q_xyz, hb, k_tiles=TOPK_K))
        rec_serve = float((got == true).mean())
        fid["recall_at1"] = round(rec_serve, 5)
        log(f"recall@1 hier_topk vs HIGHEST exact NN: {rec_serve:.4f}"
            f"  (bar: >= 0.999)")
        tfn = jax.jit(lambda a, b, c: hier_topk(a, b, c, k_tiles=TOPK_K))
        _ = int(tfn(q, q_xyz, hb)[0])
        t0 = time.perf_counter()
        for _i in range(iters):
            tk = tfn(q, q_xyz, hb)
        _ = int(tk[0])
        tk_ms = (time.perf_counter() - t0) / iters
        log(f"hier_topk endpoint: {tk_ms*1e3:.2f} ms/call -> "
            f"{nq/tk_ms:,.0f} queries/s")

        # feature-path reachable argmax (diagnostic; serving-tier logits) —
        # measured at the FULL serving batch: hier fidelity depends on the
        # spatial coherence of the bm-query tiles, so small-slice
        # measurements are unrepresentative of the serving regime
        nn = np.asarray(hier_nn(q, q_xyz, hb, k_tiles=32, j_sem=3))
        rec_feat = float((nn == true).mean())
        log(f"recall@1 reachable by hier feature path (K=32 j3, fast "
            f"tier): {rec_feat:.4f}")

        # feature error vs the f32-exact dense computation
        ref = retrieve_ref(q, q_xyz, hb.bank, sem_temp=12.0,
                           geo_temp=40.0, beta=0.5, chunk=4096)
        from range_tpu.ops.retrieval_hier import retrieve_hier

        hier_out = retrieve_hier(q, q_xyz, hb, k_tiles=32, j_sem=3,
                                 k_geo=16, scan_bm=512)
        rel = np.abs(np.asarray(hier_out) - np.asarray(ref)) / np.maximum(
            np.abs(np.asarray(ref)), 1e-1)
        fid["feat_relerr_mean"] = round(float(rel.mean()), 5)
        fid["feat_relerr_p99"] = round(float(np.percentile(rel, 99)), 5)
        # the flagship row's bars, asserted machine-readably: serving
        # recall >= 0.999 AND the feature error inside its measured band
        # (mean 2.6-2.7% / p99 ~11%; 1.5x headroom for bank/query seeds —
        # a regression past that is a real fidelity break, not noise)
        fid["fidelity_ok"] = bool(rec_serve >= 0.999
                                  and rel.mean() <= 0.04
                                  and np.percentile(rel, 99) <= 0.165)
        log(f"hier feature relerr vs f32-exact dense: mean {rel.mean():.4f} "
            f"p99 {np.percentile(rel, 99):.4f}")

        # dense exact path for comparison (same API, retrieval='dense')
        dense = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5,
                                     chunk=4096, seed=0)
        dfn = jax.jit(dense._apply3)
        _ = float(jnp.sum(dfn(dense.params, coords, dense.extra)[:1, :1]))
        t0 = time.perf_counter()
        for _i in range(iters):
            dout = dfn(dense.params, coords, dense.extra)
        _ = float(jnp.sum(dout[:1, :1]))
        d_ms = (time.perf_counter() - t0) / iters
        log(f"dense exact path: {d_ms*1e3:.2f} ms/call -> "
            f"{BATCH/d_ms:,.0f} queries/s")
    except Exception as e:  # recorded as a fidelity FAILURE, not skipped
        fid["fidelity_ok"] = False
        fid["fidelity_error"] = str(e)[:200]
        log(f"fidelity measurement FAILED (fidelity_ok=false): {e}")

    print(json.dumps({
        "metric": "range_plus_query_throughput",
        "value": round(throughput, 1),
        "unit": "queries/s",
        "vs_baseline": round(throughput / 1e7, 4),
        **fid,
    }))


def _main_with_retry(attempts: int = 3) -> None:
    # the tunneled TPU worker intermittently crashes/restarts mid-run
    # (UNAVAILABLE; observed ~hourly on the shared chip, unrelated to any
    # particular kernel) — a fresh process reconnects cleanly, so retry
    # rather than record a crashed benchmark
    import os
    import subprocess
    import time as _time

    for attempt in range(attempts - 1):
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--once"])
        if r.returncode == 0:
            return
        log(f"bench attempt {attempt + 1} failed (rc={r.returncode}) — "
            f"retrying in 60s")
        _time.sleep(60)
    main()  # last attempt in-process: its exit code is the verdict


if __name__ == "__main__":
    if "--once" in sys.argv:
        main()
    else:
        _main_with_retry()
