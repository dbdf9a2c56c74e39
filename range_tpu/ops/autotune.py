"""OOM-aware block-shape autotuner for the fused retrieval kernel.

`_pick_bn` (retrieval_pallas.py) uses a conservative analytic VMEM model —
it never OOMs, but leaves throughput on the table when a larger block would
actually fit (Mosaic's real scoped-vmem accounting depends on scheduling
details the model can't see; bm=512 measured faster on some geometries and
OOM'd on others).  This module probes candidate (bm, bn) pairs ON DEVICE:
compile + time each, catch Mosaic's scoped-vmem / resource-exhausted errors,
and keep the fastest survivor.  Results are cached per problem geometry so a
serving process pays the probe cost once per shape.

Timing fences with a scalar fetch (`float(jnp.sum(...))`) rather than
`block_until_ready()`, which can return early through a tunneled device.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger("range_tpu.autotune")

# (n_queries_bucket, bank_rows, sem_dim, value_dim, tier, mode) -> (bm, bn)
_CACHE: Dict[Tuple, Tuple[int, int]] = {}

DEFAULT_CANDIDATES: Sequence[Tuple[int, int]] = (
    (256, 1024),  # the calibrated safe default
    (256, 2048),
    (512, 1024),
    (512, 2048),
    (128, 2048),
    (1024, 512),
)


def _geometry_key(q_sem, bank, tier: str, mode: str) -> Tuple:
    # bucket query count to the kernel's bm granularity ceiling so nearby
    # batch sizes share an entry; value dtype matters (int8 banks stream
    # half the bytes and tune differently from bf16)
    qb = 1 << max(8, (q_sem.shape[0] - 1).bit_length())
    return (qb, bank.num_rows, bank.keys_sem.shape[1], bank.value_dim,
            str(bank.values.dtype), tier, mode)


def _is_oom(err: Exception) -> bool:
    s = str(err).lower()
    return ("vmem" in s or "resource" in s or "exhausted" in s
            or "out of memory" in s or "scoped" in s)


def autotune_retrieve(q_sem, q_xyz, bank, *,
                      sem_temp: float = 12.0, geo_temp: float = 40.0,
                      beta: float = 0.5, mode: str = "range+",
                      tier: str = "fast",
                      candidates: Sequence[Tuple[int, int]] = DEFAULT_CANDIDATES,
                      # deep queue: the tunnel's dispatch feed rate is
                      # ~3.5 ms/call at shallow queues (PERF.md round 3b) —
                      # 3-deep probes of sub-10ms candidates measured the
                      # HOST, not the kernels, and mis-ranked them
                      repeats: int = 60,
                      cache: Optional[Dict] = None,
                      interpret: bool = False) -> Tuple[int, int]:
    """Returns the fastest (bm, bn) for this problem geometry, probing on
    device the first time and reading the cache afterwards.  Candidates go
    to Mosaic UNCLAMPED (pick_bn=False): the compiler's own scoped-vmem
    check — not the conservative analytic `_pick_bn` model — decides
    feasibility, so shapes the hand model would reject (e.g. bm=512 at
    small Dv) stay reachable.  OOM candidates are skipped; any non-OOM
    error also skips the candidate (logged)."""
    from .retrieval_pallas import retrieve_pallas

    cache = _CACHE if cache is None else cache
    key = _geometry_key(q_sem, bank, tier, mode)
    if key in cache:
        return cache[key]

    best, best_t = None, float("inf")
    for bm, bn in candidates:
        if bm > q_sem.shape[0] and best is not None:
            continue  # padding beyond the batch only wastes work
        try:
            t = _time_candidate(q_sem, q_xyz, bank, sem_temp, geo_temp, beta,
                                mode, tier, bm, bn, repeats, interpret)
        except Exception as err:  # Mosaic OOM surfaces at compile OR run time
            if _is_oom(err):
                log.info("autotune: (bm=%d, bn=%d) OOM, skipped", bm, bn)
                continue
            log.warning("autotune: (bm=%d, bn=%d) failed: %s", bm, bn, err)
            continue
        log.info("autotune: (bm=%d, bn=%d) %.3f ms", bm, bn, t * 1e3)
        if t < best_t:
            best, best_t = (bm, bn), t
    if best is None:  # every candidate failed: fall back to safe default,
        # with bn halved until it divides the bank rows (candidates are
        # probed unclamped, but an undividing fallback would trip
        # retrieve_fused's `N % bn == 0` downstream)
        bn = 1024
        while bn > 128 and bank.num_rows % bn != 0:
            bn //= 2
        best = (256, bn)
    cache[key] = best
    return best


def _time_candidate(q_sem, q_xyz, bank, sem_temp, geo_temp, beta, mode, tier,
                    bm, bn, repeats, interpret=False) -> float:
    import functools

    from .retrieval_pallas import retrieve_pallas

    # jit with the bank as an ARGUMENT (a closure constant would serialize
    # the whole bank into the HLO), matching how serving calls the kernel —
    # un-jitted, per-call repacking and dispatch overhead would swamp the
    # differences the tuner is trying to measure.
    # pick_bn=False: candidates go to Mosaic unclamped — the compiler's own
    # scoped-vmem check is the feasibility oracle (OOMs are caught and
    # skipped by the caller), not the conservative analytic model
    fn = jax.jit(functools.partial(retrieve_pallas, sem_temp=sem_temp,
                                   geo_temp=geo_temp, beta=beta, mode=mode,
                                   tier=tier, bm=bm, bn=bn, pick_bn=False,
                                   interpret=interpret))

    # measure the PIPELINED regime (dispatch `repeats` times, fence once with
    # a scalar fetch) — serving overlaps dispatch with device compute, and a
    # per-call fence would add a tunnel round-trip to every sample, hiding
    # the block-shape differences being measured.  Best-of-3 rounds: the
    # shared tunneled chip shows multi-ms noise spikes that a single round
    # mis-ranks candidates on (measured round 3)
    float(jnp.sum(fn(q_sem, q_xyz, bank)))  # compile + warm
    best = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(q_sem, q_xyz, bank)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def retrieve_autotuned(q_sem, q_xyz, bank, **kwargs):
    """`retrieve_pallas` with autotuned block shapes.  kwargs as
    retrieve_pallas minus bm/bn."""
    from .retrieval_pallas import retrieve_pallas

    tune_keys = {k: kwargs[k] for k in ("sem_temp", "geo_temp", "beta",
                                        "mode", "tier", "interpret")
                 if k in kwargs}
    bm, bn = autotune_retrieve(q_sem, q_xyz, bank, **tune_keys)
    # the tuned shape was proven feasible by the compiler — don't re-clamp
    return retrieve_pallas(q_sem, q_xyz, bank, bm=bm, bn=bn, pick_bn=False,
                           **kwargs)


# ---------------------------------------------------------------------------
# hier-pipeline knob tuner

# (n_queries_bucket, N, bn, gsz_sem, gsz_geo, tier, mode) -> (bm, tc)
_HIER_CACHE: Dict[Tuple, Tuple[int, int]] = {}

# bm x tc grid.  bm is NOT a pure perf knob — it widens the per-tile
# selection union and measurably degrades relerr/recall (bm=512: relerr
# 2.65% -> 3.01%, topk recall 0.9992 -> 0.9983, PERF.md round 3b) — so the
# default grid holds serving bm=256 and races tc only (tc must divide
# t_pad; build pads to a multiple of 32).  tc=32 halves grid steps and
# probes FASTER but historically MISCOMPILES (5 corrupt tail rows out of
# 10240 at bm=512 — caught only by output comparison, the compile
# succeeds), which is why every candidate now passes a numeric gate
# against the first survivor before it may win.
DEFAULT_HIER_CANDIDATES: Sequence[Tuple[int, int]] = (
    (256, 16),  # the calibrated default
    # tc=32 is BLACKLISTED: the scan kernel's stats/tail corrupt at tc=32
    # on Mosaic (worst maxrel 0.26 vs tc=16 across 8 trials at BOTH
    # bm=256 and bm=512; r3b stress sweep) while compiling cleanly — and
    # the end-to-end numeric gate below dilutes scan-level corruption
    # under its 5% threshold, so the grid must not offer it at all
    (256, 8),
    (128, 16),
)


def _arbitrate_mismatch(cand, ref, gold, tol: float = 0.05) -> str:
    """Decide which of two disagreeing candidate outputs matches a
    known-good oracle: 'candidate', 'reference', or 'unknown' (both or
    neither within `tol` maxrel of `gold`).  Pure numpy so the tc=32-style
    deterministic-miscompile arbitration is unit-testable."""
    import numpy as np

    den = np.maximum(np.abs(gold), 1e-1)
    rc = float((np.abs(cand - gold) / den).max())
    rr = float((np.abs(ref - gold) / den).max())
    c_ok, r_ok = rc <= tol, rr <= tol
    if c_ok and not r_ok:
        return "candidate"
    if r_ok and not c_ok:
        return "reference"
    return "unknown"


def _hier_geometry_key(q_sem, hb, mode: str) -> Tuple:
    qb = 1 << max(8, (q_sem.shape[0] - 1).bit_length())
    return (qb, hb.k_cat.shape[0], hb.bn, hb.gsz_sem, hb.gsz_geo, hb.tier,
            mode)


def autotune_hier(q_sem, q_xyz, hb, *,
                  sem_temp: float = 12.0, geo_temp: float = 40.0,
                  beta: float = 0.5, mode: str = "range+",
                  k_tiles: int = 16, j_sem: int = 2, j_geo: int = 2,
                  candidates: Sequence[Tuple[int, int]] = DEFAULT_HIER_CANDIDATES,
                  repeats: int = 60, cache: Optional[Dict] = None,
                  interpret: bool = False) -> Tuple[int, int]:
    """Fastest (bm, tc) for the hier pipeline at this problem geometry —
    the same compile-oracle probe as `autotune_retrieve` (Mosaic's own
    scoped-vmem accounting decides feasibility; OOM candidates are skipped,
    timed survivors race).  `k_tiles`/`j_*` are FIDELITY knobs, not tuned
    here: they change recall, so picking them by wall clock alone would
    silently trade accuracy for speed — bench.py measures that frontier.

    Every tc candidate divides the build's t_pad (padded to a multiple of
    TC=32 at build, retrieval_hier.py); bm=128 stays reachable for
    small-batch coherence."""
    import functools

    from .retrieval_hier import retrieve_hier

    cache = _HIER_CACHE if cache is None else cache
    key = _hier_geometry_key(q_sem, hb, mode)
    if key in cache:
        return cache[key]

    best, best_t = None, float("inf")
    ref_out = {}  # bm -> reference output of that bm's first survivor
    for bm, tc in candidates:
        if hb.t_pad % tc != 0:
            continue
        if bm > q_sem.shape[0] and best is not None:
            continue
        fn = jax.jit(functools.partial(
            retrieve_hier, sem_temp=sem_temp, geo_temp=geo_temp, beta=beta,
            mode=mode, k_tiles=k_tiles, bm=bm, tc=tc, j_sem=j_sem,
            j_geo=j_geo, interpret=interpret))
        try:
            first = fn(q_sem, q_xyz, hb)
            float(jnp.sum(first))  # compile + warm
            # numeric gate: tc is semantics-free, so any same-bm deviation
            # beyond fp noise is a MISCOMPILE (tc=32 has produced silently
            # corrupt rows on Mosaic with a clean compile) — never let a
            # broken-but-fast candidate win
            import numpy as _np

            a = _np.asarray(first)
            if bm in ref_out:
                rel = (_np.abs(a - ref_out[bm])
                       / _np.maximum(_np.abs(ref_out[bm]), 1e-1))
                if rel.max() > 0.05:
                    # either side could be the miscompile — and a
                    # DETERMINISTIC miscompile is self-consistent across
                    # reruns, so rerunning the reference cannot exonerate
                    # it (advisor r3 #4).  Arbitrate against a known-good
                    # oracle: the same pipeline in interpret mode (Pallas
                    # blocks lowered as plain XLA ops, no Mosaic) on the
                    # first bm queries — a prefix whose output is
                    # tile-self-contained (selection unions are per
                    # bm-query tile, scan stats per query).
                    gold = _np.asarray(jax.jit(functools.partial(
                        retrieve_hier, sem_temp=sem_temp,
                        geo_temp=geo_temp, beta=beta, mode=mode,
                        k_tiles=k_tiles, bm=bm, tc=tc, j_sem=j_sem,
                        j_geo=j_geo, interpret=True))(
                            q_sem[:bm], q_xyz[:bm], hb))
                    verdict = _arbitrate_mismatch(a[:bm], ref_out[bm][:bm],
                                                  gold)
                    if verdict == "candidate":
                        log.warning(
                            "autotune_hier: reference for bm=%d disagrees "
                            "with the interpret oracle — demoted; "
                            "(bm=%d, tc=%d) becomes the reference",
                            bm, bm, tc)
                        ref_out[bm] = a
                    else:
                        # "reference" or "unknown": keep the incumbent —
                        # when the oracle can't separate them, rejecting
                        # the newcomer is the conservative choice
                        log.warning(
                            "autotune_hier: (bm=%d, tc=%d) NUMERIC "
                            "MISMATCH (maxrel %.3g, oracle verdict %s) — "
                            "rejected", bm, tc, float(rel.max()), verdict)
                        continue
            else:
                ref_out[bm] = a
            t = float("inf")  # best-of-3 rounds (tunnel noise mis-ranks
            for _round in range(3):  # single-round probes; see above)
                t0 = time.perf_counter()
                for _ in range(repeats):
                    out = fn(q_sem, q_xyz, hb)
                float(jnp.sum(out))
                t = min(t, (time.perf_counter() - t0) / repeats)
        except Exception as err:
            if _is_oom(err):
                log.info("autotune_hier: (bm=%d, tc=%d) OOM, skipped", bm, tc)
                continue
            log.warning("autotune_hier: (bm=%d, tc=%d) failed: %s",
                        bm, tc, err)
            continue
        log.info("autotune_hier: (bm=%d, tc=%d) %.3f ms", bm, tc, t * 1e3)
        if t < best_t:
            best, best_t = (bm, tc), t
    if best is None:
        tc = 16
        while tc > 1 and hb.t_pad % tc != 0:
            tc //= 2
        best = (256, tc)
    cache[key] = best
    return best
