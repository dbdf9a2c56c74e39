"""RANGE / RANGE+ retrieval-augmented location encoders.

Counterpart of the 'RANGE' branches of the reference dispatcher
(`range/range.py:76-114` init, `range/range.py:208-242` forward):

  1. query = SatCLIP location tower (SH L=40 -> SIREN), L2-normalized
  2. semantic path: softmax(temp * q @ bank_satclipT) @ bank_image
  3. (RANGE+) angular path: softmax(geo_temp * xyz @ bank_xyzT) @ bank_image,
     blended `beta * semantic + (1-beta) * angular`  (range.py:238)
  4. output = concat([retrieved_1024, query_256]) -> [B, 1280]

Temperatures follow the reference exactly: RANGE temp=15 (range.py:103),
RANGE+ semantic=12 / geo=40 (range.py:108-109), beta default 0.5
(`load_model.py:40`).

TPU-first design notes:
  * retrieval is streaming/fused (ops/retrieval.py, ops/retrieval_pallas.py)
    — the [B, N] similarity matrix never exists;
  * the whole forward is one jitted function; unlike the reference, which
    returns a *numpy* array and round-trips device<->host mid-forward
    (range.py:222,240 — a documented upstream wart), we return a device
    array;
  * with a mesh, the bank rows are sharded and partial softmaxes combine
    exactly (parallel/sharded.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from ..bank.bank import GeoBank
from ..geometry import lonlat_deg_to_xyz
from ..ops import retrieval
from .satclip import SatClipLocationEncoder

RANGE_TEMP = 15.0
RANGE_PLUS_SEM_TEMP = 12.0
RANGE_PLUS_GEO_TEMP = 40.0


@dataclasses.dataclass(frozen=True)
class RangeConfig:
    mode: str = "range+"  # 'range' | 'range+'
    beta: float = 0.5
    sem_temp: Optional[float] = None  # None => reference defaults per mode
    geo_temp: float = RANGE_PLUS_GEO_TEMP
    chunk: int = 4096
    compute_dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None  # None => auto (TPU only)
    # Pallas kernel logit precision: 'fast' (bf16 sem + hi/lo geo, default),
    # 'high' (hi/lo both), 'exact' (true f32) — see ops/retrieval_pallas.py.
    tier: str = "fast"
    # Retrieval algorithm: 'dense' (exact, every bank row — the default) or
    # 'hier' (two-stage approximate, ops/retrieval_hier.py: exact dual
    # softmax over selected bank tiles + group-centroid tail for the rest;
    # ~3x the dense throughput at feature relerr ~2% on autocorrelated
    # banks — measured in PERF.md; top-k serving for recall-critical uses
    # goes through ops/topk.topk_packed(tier='high') instead).  'hier'
    # requires the bank prepared with build_hier_bank (the API layer does
    # this when retrieval='hier').
    retrieval: str = "dense"
    k_tiles: int = 16      # hier: exact tiles per query tile (recall knob)
    m_tiles: Any = None    # hier two-level: fine-refined tiles (None = auto)
    k_geo: int = 0         # hier: split exact budgets (sem-only K + geo K)
    j_sem: int = 2         # hier: per-query sem groups scattered
    j_geo: int = 2         # hier: per-query geo groups scattered
    hier_bm: int = 256     # hier: query-tile size
    # hier: scan query-block size (0 = same as bm).  The scan emits
    # per-query stats, so its block is a pure perf knob: group-operand HBM
    # traffic scales as Bp/scan_bm (measured +3% e2e at 512 on the 100k
    # flagship); selection coherence is untouched (that's hier_bm's job)
    hier_scan_bm: int = 0
    # hier: batches below this fall back to the dense EXACT kernel (0%
    # feature error, but the dense kernel streams the whole bank: ~28-39
    # ms/call at ANY batch size).  Default 0: all batch sizes serve
    # hierarchically, with apply() auto-widening the selection budget at
    # small B to hold feature error flat (B=512 with 3x K matches the
    # flagship's 2.65% relerr at 36x the dense throughput — PERF.md r3c).
    # Set e.g. 2048 when small batches must be bit-exact instead of fast.
    hier_min_batch: int = 0
    # hier: mass-bound-adaptive rescue fraction (0 = off).  The fraction of
    # queries with the lowest selected-mass coverage re-run the parts
    # kernels with an `adaptive_mult`x wider selection, capping the p99
    # feature-error tail for ~frac*mult extra parts work (round 4 —
    # ops/retrieval_hier.retrieve_hier docstring)
    adaptive_frac: float = 0.0
    adaptive_mult: int = 3
    # hier: extra corrected tiles for tail_super banks (retrieve_hier's
    # m_corr — fine-tail restoration beyond the K exact tiles at ~gpt/bn
    # of an exact tile's cost each; ignored on non-tail_super banks)
    m_corr: int = 0
    # hier: query-block tile-list dedup (round 5).  dedup=f merges every f
    # adjacent bm-query blocks' selected-tile lists into ONE parts dispatch
    # with the deduplicated union (k_union slots; None = auto).  Selection
    # granularity/fidelity is untouched — each block keeps its own K tiles
    # and its queries get the neighbors' tiles as a free exact-coverage
    # bonus; the parts work drops by ~f*K/k_union (the adjacent lists
    # overlap heavily after the geographic sort — measured in PERF.md r5)
    dedup: int = 0
    k_union: Any = None
    # Multi-chip serving: a jax.sharding.Mesh whose `bank_axis` shards the
    # bank rows (parallel/sharded.py).  The API layer shards the bank at
    # load; apply() routes to the sharded kernels (psum partial combine —
    # exact, not approximate).  `data_axis` optionally shards the query
    # batch on a 2-D mesh.
    mesh: Any = None
    bank_axis: str = "bank"
    data_axis: Optional[str] = None
    shard_bm: int = 512    # sharded pallas kernel query-tile rows
    shard_bn: int = 1024   # sharded pallas kernel bank-tile rows

    def resolved_sem_temp(self) -> float:
        if self.sem_temp is not None:
            return self.sem_temp
        return RANGE_PLUS_SEM_TEMP if self.mode == "range+" else RANGE_TEMP


class RangeEncoder:
    """query tower + bank retrieval.  Pure apply over (params, coords)."""

    def __init__(self, query_encoder: SatClipLocationEncoder, bank: GeoBank,
                 config: RangeConfig):
        self.query_encoder = query_encoder
        self.bank = bank
        self.config = config
        self.embedding_dim = bank.value_dim + query_encoder.embedding_dim

    def query_embedding(self, params, lonlat_deg: jnp.ndarray) -> jnp.ndarray:
        q = self.query_encoder.apply(params, lonlat_deg)
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def apply(self, params, lonlat_deg: jnp.ndarray, *, bank: Optional[GeoBank] = None
              ) -> jnp.ndarray:
        import jax

        cfg = self.config
        bank = self.bank if bank is None else bank
        q_sem = self.query_embedding(params, lonlat_deg).astype(jnp.float32)
        q_xyz = None
        if cfg.mode == "range+":
            q_xyz = lonlat_deg_to_xyz(lonlat_deg.astype(jnp.float32))
        from ..ops.retrieval_hier import HierBank

        if isinstance(bank, HierBank) and (cfg.retrieval != "hier"
                                           or lonlat_deg.shape[0]
                                           < cfg.hier_min_batch):
            # explicit opt-out: hier_min_batch > 0 routes batches below it
            # to the EXACT dense kernel (0% feature error; ~28-39 ms/call
            # regardless of batch — the dense kernel streams the whole
            # bank).  The default is 0: small batches stay hierarchical
            # with the selection budget auto-widened below.  B is static
            # under jit, so this is a compile-time branch.
            bank = bank.bank
        if cfg.retrieval == "hier" and isinstance(bank, HierBank):
            # shrink bm with the batch so query tiles stay spatially tight
            # (>= 128: transposed scan blocks need a 128-lane query dim)
            B = lonlat_deg.shape[0]
            bm = min(cfg.hier_bm, max(128, B // 40 // 128 * 128))
            # small batches lack the spatial coherence the shared per-tile
            # selection relies on (measured: tile coverage 0.98 at B=10k,
            # 0.25 at B=2k with bm=256) — widen the selection budget to
            # hold feature error FLAT instead of falling back to dense:
            # at B=512, 3x K restores the flagship's 2.65% relerr at
            # ~0.84 ms (36x the dense kernel's throughput); at B in
            # [2048, 8192), 1.5x K suffices (PERF.md round 3c)
            k_tiles, k_geo, j_sem = cfg.k_tiles, cfg.k_geo, cfg.j_sem
            if B < 2048:
                k_tiles, k_geo, j_sem = 3 * k_tiles, 3 * k_geo, j_sem + 2
            elif B < 8192:
                k_tiles = k_tiles + k_tiles // 2
                k_geo = k_geo + k_geo // 2
                j_sem = j_sem + 1
            if cfg.mesh is not None:
                from ..parallel.sharded import sharded_retrieve_hier

                n = cfg.mesh.shape[cfg.bank_axis]
                # full single-chip kwarg parity (VERDICT r4 #5): scan_bm,
                # adaptive rescue, m_corr, dedup, and the fused
                # combine+concat epilogue all ride the mesh path
                return sharded_retrieve_hier(
                    q_sem, q_xyz, bank, cfg.mesh,
                    sem_temp=cfg.resolved_sem_temp(), geo_temp=cfg.geo_temp,
                    beta=cfg.beta, mode=cfg.mode,
                    k_tiles=max(2, k_tiles // n), bm=bm,
                    m_tiles=(max(2, cfg.m_tiles // n)
                             if cfg.m_tiles else None),
                    k_geo=max(1, k_geo // n) if k_geo else 0,
                    j_sem=j_sem, j_geo=cfg.j_geo,
                    scan_bm=cfg.hier_scan_bm or None,
                    concat_query=q_sem,
                    adaptive_frac=cfg.adaptive_frac,
                    adaptive_mult=cfg.adaptive_mult,
                    m_corr=cfg.m_corr,
                    dedup=cfg.dedup if B >= 8192 else 0,
                    k_union=cfg.k_union,
                    bank_axis=cfg.bank_axis,
                    interpret=jax.default_backend() != "tpu")
            else:
                from ..ops.retrieval_hier import retrieve_hier

                # concat_query moves the [retrieved | query] concat INSIDE
                # retrieve_hier, where the flagship shape fuses it into the
                # combine kernel's epilogue (one HBM pass instead of ~5)
                return retrieve_hier(
                    q_sem, q_xyz, bank,
                    sem_temp=cfg.resolved_sem_temp(), geo_temp=cfg.geo_temp,
                    beta=cfg.beta, mode=cfg.mode, k_tiles=k_tiles,
                    m_tiles=cfg.m_tiles, k_geo=k_geo,
                    bm=bm, j_sem=j_sem, j_geo=cfg.j_geo,
                    scan_bm=cfg.hier_scan_bm or None,
                    concat_query=q_sem,
                    adaptive_frac=cfg.adaptive_frac,
                    adaptive_mult=cfg.adaptive_mult,
                    m_corr=cfg.m_corr,
                    # small widened batches already dispatch few blocks;
                    # dedup would merge across unrelated regions there
                    dedup=cfg.dedup if B >= 8192 else 0,
                    k_union=cfg.k_union,
                    interpret=jax.default_backend() != "tpu",
                )
        use_pallas = cfg.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if cfg.mesh is not None:
            from ..parallel.sharded import (sharded_retrieve,
                                            sharded_retrieve_pallas)

            if use_pallas or jax.default_backend() == "tpu":
                retrieved = sharded_retrieve_pallas(
                    q_sem, q_xyz, bank, cfg.mesh,
                    sem_temp=cfg.resolved_sem_temp(), geo_temp=cfg.geo_temp,
                    beta=cfg.beta, mode=cfg.mode, tier=cfg.tier,
                    bm=cfg.shard_bm, bn=cfg.shard_bn,
                    bank_axis=cfg.bank_axis, data_axis=cfg.data_axis,
                    interpret=jax.default_backend() != "tpu")
            else:
                retrieved = sharded_retrieve(
                    q_sem, q_xyz, bank, cfg.mesh,
                    sem_temp=cfg.resolved_sem_temp(), geo_temp=cfg.geo_temp,
                    beta=cfg.beta, mode=cfg.mode, chunk=cfg.chunk,
                    bank_axis=cfg.bank_axis, data_axis=cfg.data_axis)
            return jnp.concatenate([retrieved, q_sem], axis=-1)
        if use_pallas:
            from ..ops.retrieval_pallas import retrieve_pallas

            retrieved = retrieve_pallas(
                q_sem,
                q_xyz,
                bank,
                sem_temp=cfg.resolved_sem_temp(),
                geo_temp=cfg.geo_temp,
                beta=cfg.beta,
                mode=cfg.mode,
                tier=cfg.tier,
            )
        else:
            retrieved = retrieval.retrieve(
                q_sem,
                q_xyz,
                bank,
                sem_temp=cfg.resolved_sem_temp(),
                geo_temp=cfg.geo_temp,
                beta=cfg.beta,
                mode=cfg.mode,
                chunk=cfg.chunk,
                compute_dtype=cfg.compute_dtype,
            )
        return jnp.concatenate([retrieved, q_sem], axis=-1)

    def __call__(self, params, lonlat_deg, **kw):
        return self.apply(params, lonlat_deg, **kw)
