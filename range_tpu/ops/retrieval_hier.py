"""Hierarchical (two-stage) approximate retrieval — the throughput path.

The dense fused kernel (retrieval_pallas.py) is near its machine roofline:
2 value matmuls + 2 exps per (query, bank row) caps the exact algorithm at
~0.3-0.7M queries/s/chip on v5e (PERF.md).  The remaining ~30x to the 10M
north star must come from the ALGORITHM.  Measured structure of the two
softmax families (informative autocorrelated bank, PERF.md round 2):

  * geo (temp 40) is sharply local — ~0.2% of rows hold 50% of the mass;
  * sem (temp 12) is DIFFUSE by design (the paper's multi-resolution blend):
    ~25% of rows hold 50% of the mass.  Dropping bank tiles can never
    approximate it — but a fine-grained centroid expansion can: for a group
    g of rows with similar KEYS,  sum_{r in g} e^{l_r} v_r ~= e^{l_{c_g}} V_g
    (V_g = sum of the group's values) with error second-order in the group's
    key spread.  Grouping rows by k-means in KEY space (not geography)
    minimizes exactly that spread; running the key-k-means WITHIN each
    geographic tile keeps groups tile-aligned, so per-query-tile tile
    selection masks apply to groups.

Pipeline (semantics preserved from `range/range.py:209-240`):
  offline  `build_hier_bank`: geographic k-means reorder with DENSE packing
           (bank/clustered.py pack='dense' — no inter-cluster padding, ~25%
           fewer tiles than the pruned path's padded layout); key-space
           k-means WITHIN each bn-row tile so each gsz-row window is a
           key-coherent group; prepacked serving operands; per-group packed
           centroids + value sums at independent granularity per family
           (fine for the diffuse sem family, coarse for the local geo one);
           hi/lo-split keys for the top-k kernel; optional `shards=` layout
           for mesh serving (round-robin tile interleave).
  online   1. sort the query batch geographically (bm-query tiles become
              spatially coherent so a shared per-tile candidate list works)
              — BEFORE the scan, so per-query stats never need permuting;
           2. fused SCAN kernel: ONE group-granularity pass emitting both
              per-(query, tile) selection stats — max group logit and
              exp-mass, no [B, G] HBM materialization — AND the ALL-tiles
              group-centroid tail  sum_g e^{l_cg} [V_g | n_g];
           3. selection (XLA over [B, T] stats, T ~ 200): per-query top-j
              tiles by max-logit (the argmax guarantee: a query's true-
              argmax tile carries its hottest group) unioned over the bm
              queries of a query tile + mass-rank fill, capped to static K;
           4. PARTS kernel: per selected tile, EXACT dual-softmax partials
              MINUS that tile's group approximation (grid walks a scalar-
              prefetched tile list; bounded logits -> plain sums), so
              total = scan_tail + sum_sel(exact − approx) with no second
              pass over the bank;
           5. combine, normalize, blend, restore order.

Work per query: K*bn exact rows + N/gsz tail groups, vs N dense.  Fidelity
is MEASURED, not assumed (bench.py, every run): `hier_topk` recall@1 vs
HIGHEST-precision exact NN (>= 0.999 bar), feature error vs the exact dense
path, and the feature path's reachable recall; `k_tiles`/`j_sem` trade
throughput vs recall, `gsz_sem` tail cost vs feature error.  Fidelity also
depends on BATCH spatial coherence — see retrieve_hier's docstring.

Round-3 extensions (PERF.md rounds 3-3c; all default-on in the shipped
`api.SERVING_PROFILES['flagship']`):
  * `group_by='key_value'` (build default): groups cluster on
    [key | v/|v|] so group value sums stay value-pure — the tail-fidelity
    lever that closed the downstream-probe gap;
  * `k_geo` asymmetric family budgets: sem-only + geo-only parts kernels
    so the probe-critical K_sem grows without paying the geo value matmul
    on every tile;
  * `lr_rank`: low-rank sem TAIL (rank-r coefficients of the group value
    sums; the scan's tail matmul contracts r instead of Dv+pad columns);
  * `res_rank`: residual-rank PARTS — exact p@V computed as
    (segsum(p)/cnt)@vsum + (p@z)@w against a global rank-k eigenbasis of
    the within-group value residuals, so the [bn, Dv] value stream leaves
    the parts kernels entirely (exact at k >= Dv);
  * `topk_gsz`: a FINER stats-only centroid operand for the top-k
    selection signal, decoupling the feature tail's granularity (coarse =
    cheap scan) from the recall path's (fine = small K);
  * small batches auto-widen the selection budget instead of falling back
    to the (bank-stream-bound) dense kernel — models/range_encoder.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bank.bank import GeoBank, dequantize_values
from .retrieval_pallas import (CLAMP2, LOG2E, NEG, _round_up, _serving_values,
                               pack_bank, pack_queries, packed_dims)

# the scan/tail grids step `TC` tiles at a time; group operands are padded to
# a TC-divisible tile count at build so any tc <= TC dividing t_pad works
TC = 32


@dataclasses.dataclass
class HierBank:
    """Clustered + prepacked serving bank for `retrieve_hier`.

    Data (jnp arrays; N = padded rows, T = N/bn real tiles, padded to
    t_pad = round_up(T, 32) in the group-granularity operands;
    G* = t_pad * bn/gsz_*; Dvp = round_up(Dv+1, 128)):
      bank:        the clustered GeoBank (row-reordered, dense-packed)
      k_cat:       [N, cat_d]  packed serving keys (pack_bank, `tier`)
      values:      [N, Dv]     serving values (bf16, or int8 with scale)
      value_scale: [1, N] f32  int8 dequant scales or None
      mask_neg:    [1, N] f32  additive row-validity mask (0 / -1e30)
      sem_centroid/geo_centroid/sem_radius/geo_radius: tile bounding balls
        ([T, Dk], [T, 3], [T], [T] f32) — kept for range-mode home grouping
        and introspection
      g_sem_cat:   [G_s, cat_d] packed sem group centroids (geo cols zero,
                   so a full-width dot against packed queries yields the
                   UNTEMPERED sem group logit in exp2 units)
      g_geo_cat:   [G_g, cat_d] packed geo group centroids (sem cols zero)
      g_sem_vw / g_geo_vw: [G*, Dvp] group VALUE SUMS with the valid-row
                   count in column Dv (denominator rides the same matmul)
      khl_sem:     [N, 2*Dk] bf16 [k_hi | k_lo] hi/lo-split semantic keys —
                   the ~f32-accurate operand of the top-k/argmax kernel
                   (logit = qh.kh + qh.kl + ql.kh, retrieval_pallas 'high'
                   tier semantics without the 3-fold column duplication)
    Meta (static): tier, bn, gsz_sem, gsz_geo, sem_d, cat_d, t_real, t_pad.
    """

    bank: GeoBank
    k_cat: jnp.ndarray
    values: jnp.ndarray
    value_scale: Optional[jnp.ndarray]
    mask_neg: jnp.ndarray
    sem_centroid: jnp.ndarray
    geo_centroid: jnp.ndarray
    sem_radius: jnp.ndarray
    geo_radius: jnp.ndarray
    g_sem_cat: jnp.ndarray
    g_geo_cat: jnp.ndarray
    g_sem_vw: jnp.ndarray
    g_geo_vw: jnp.ndarray
    khl_sem: Optional[jnp.ndarray] = None
    # two-level tail (build_hier_bank(gsz_super=...)): packed SUPERGROUP
    # centroids/value-sums at gsz_super granularity, nested over the fine
    # sem groups (each gsz_super window = gsz_super/gsz_sem fine groups)
    g_sup_cat: Optional[jnp.ndarray] = None
    g_sup_vw: Optional[jnp.ndarray] = None
    # low-rank sem tail (build_hier_bank(lr_rank=r)): rank-r coefficients
    # of the fine-group value sums (count in column r) + the [r, Dv]
    # unprojection basis — the tail value matmul contracts r instead of
    # Dvp (~4x less scan work at r=256, Dv=1024)
    g_sem_vw_lr: Optional[jnp.ndarray] = None
    u_sem: Optional[jnp.ndarray] = None
    # low-rank GEO tail (build_hier_bank(lr_geo=r)) — same factorization
    # for the geo family's group value sums (round 4: the geo tail matmul
    # was ~30% of scan flops at Dvp=1152; the sharply-local geo family's
    # tail mass is small, so the truncation is fidelity-cheap)
    g_geo_vw_lr: Optional[jnp.ndarray] = None
    u_geo: Optional[jnp.ndarray] = None
    # residual-rank parts (build_hier_bank(res_rank=k)): per-family
    # row-value RESIDUALS vs the serving group mean, projected on a global
    # rank-k eigenbasis.  The parts kernels then never stream/matmul the
    # [bn, Dv] values: exact p@V is computed as
    #   (segsum(p)/cnt) @ group_value_sum  +  (p @ z) @ w
    # — exact when k >= Dv (the basis is complete), else the only loss is
    # the rank truncation of the WITHIN-GROUP residuals (small by
    # construction under joint key+value clustering).  z_*: [N, rp] bf16
    # coefficients; w_*: [rp, Dv] f32 basis (rp = round_up(k, 128)).
    z_sem: Optional[jnp.ndarray] = None
    w_sem: Optional[jnp.ndarray] = None
    z_geo: Optional[jnp.ndarray] = None
    w_geo: Optional[jnp.ndarray] = None
    # weighted-supergroup sem TAIL (build_hier_bank(tail_super=ts), round
    # 4): the scan's sem tail matmul contracts SUPERGROUPS of ts rows
    # (ratio = ts/gsz_sem fine groups each) instead of fine groups — the
    # fine exp-mass segment-sums onto the supergroup (a free reshape-sum,
    # like the stats) and the tail operand narrows gpt_s -> gpt_s/ratio
    # rows per tile.  g_sem_ts_vw[s] = (sum of the member groups' vw) /
    # ratio; g_sem_ts_dvw[g] = vw[g] - ts_vw[sup(g)] is the fine-minus-
    # super CORRECTION operand: a cheap group-granularity kernel restores
    # the exact fine tail on the selected K+M tiles (scan_super + dvw =
    # fine there, so the parts kernel's fine subtraction stays exact).
    # Error remains only on UNSELECTED tiles (supergroup-mean values under
    # fine exp-mass weights; the count/denominator column is exact up to
    # the masked pad rows of the final partial tile).
    g_sem_ts_vw: Optional[jnp.ndarray] = None
    g_sem_ts_dvw: Optional[jnp.ndarray] = None
    # optional FINER sem group centroids for the top-k stats scan only
    # (build_hier_bank(topk_gsz=...)): a coarse feature-tail granularity
    # (gsz_sem=16 halves the fused scan) degrades the topk SELECTION
    # signal, which otherwise needs a wider K to hold recall — a slim
    # stats-only operand at gsz 8 restores the fine signal for ~7 MB at
    # 100k rows and no feature-path cost
    g_topk_cat: Optional[jnp.ndarray] = None
    # low-rank SELECTION operand (build_hier_bank(topk_lr=k), round 5 —
    # the "cheaper selection signal" lever): the top-k path's stats scan
    # only needs RANKING quality, not accurate logits, so the fine topk
    # centroids factor through a rank-k PCA basis — g_topk_lr [G, k] are
    # the centroid coefficients, p_topk [k, sem_d] the basis; serving
    # projects the packed queries once ([B, sem_d] @ p_topk^T, ~free) and
    # the stats matmul contracts k instead of sem_d (2-4x less selection
    # scan work at k=128/64; recall impact measured in PERF.md round 5)
    g_topk_lr: Optional[jnp.ndarray] = None
    p_topk: Optional[jnp.ndarray] = None
    # low-rank selection+tail operand for the FEATURE path
    # (build_hier_bank(sel_lr=k), round 5 — the feature-path counterpart
    # of topk_lr, VERDICT r4 #1 design (b)): the fused scan's sem group
    # logits AND the parts kernels' group-approximation logits both
    # contract a rank-k PCA sketch of the gsz_sem centroids instead of
    # sem_d — the two sides use the SAME sketched logits, so the
    # exact-minus-approx telescoping stays exact; the only approximation
    # introduced is (a) sketched exp-masses on UNSELECTED groups' tail
    # and (b) selection-ranking noise.  g_sem_sel [G_s, k] are the
    # centroid coefficients, p_sel [k, sem_d] the basis; serving projects
    # the packed queries once (~free).  Adoption measured in PERF.md r5.
    g_sem_sel: Optional[jnp.ndarray] = None
    p_sel: Optional[jnp.ndarray] = None
    tier: str = "fast"
    bn: int = 512
    gsz_sem: int = 8
    gsz_geo: int = 64
    gsz_super: int = 0
    lr_rank: int = 0
    lr_geo: int = 0
    res_rank: int = 0
    topk_gsz: int = 0
    topk_lr: int = 0
    tail_super: int = 0
    sel_lr: int = 0
    sem_d: int = 256
    cat_d: int = 384
    t_real: int = 0
    t_pad: int = 0

    @property
    def n_tiles(self) -> int:
        return self.t_real

    @property
    def value_dim(self) -> int:
        return self.values.shape[1]


jax.tree_util.register_dataclass(
    HierBank,
    data_fields=["bank", "k_cat", "values", "value_scale", "mask_neg",
                 "sem_centroid", "geo_centroid", "sem_radius", "geo_radius",
                 "g_sem_cat", "g_geo_cat", "g_sem_vw", "g_geo_vw", "khl_sem",
                 "g_sup_cat", "g_sup_vw", "g_sem_vw_lr", "u_sem",
                 "g_geo_vw_lr", "u_geo",
                 "z_sem", "w_sem", "z_geo", "w_geo",
                 "g_sem_ts_vw", "g_sem_ts_dvw", "g_topk_cat", "g_topk_lr",
                 "p_topk", "g_sem_sel", "p_sel"],
    meta_fields=["tier", "bn", "gsz_sem", "gsz_geo", "gsz_super", "lr_rank",
                 "lr_geo", "res_rank", "topk_gsz", "topk_lr", "tail_super",
                 "sel_lr", "sem_d", "cat_d", "t_real", "t_pad"],
)


def _order_rows_within_tiles(keys: jnp.ndarray, valid: jnp.ndarray, bn: int,
                             n_groups: int, seed: int,
                             n_super: int = 0) -> np.ndarray:
    """Permutation [N] that reorders rows WITHIN each bn-row tile so rows
    with similar keys are consecutive: per-tile k-means in key space
    (vmapped Lloyd on device), rows sorted by cluster label, invalid rows
    last.  Tile membership is untouched, so tile stats/masks stay valid.

    `keys` is whatever feature the groups should be coherent IN — the
    serving keys alone, or [keys | lam * normalized values] for joint
    key+value clustering (build_hier_bank(group_by='key_value')): the
    group tail's error is first-order in BOTH the within-group logit
    spread AND the within-group value spread, and on banks whose values
    carry label-like structure (the probe benchmarks), value-pure groups
    are what keeps the diffuse-mass tail from class-mixing (measured:
    checkerboard probe 0.81 -> 0.92 at equal gsz, tools/fidelity_lab.py).

    `n_super > 0` makes the ordering HIERARCHICAL: a second (tiny) k-means
    clusters the n_groups fine CENTROIDS into n_super superclusters, and
    rows sort by (supercluster, fine cluster) — so gsz_super-row windows
    are key-coherent supergroups whose nested gsz-row windows are the same
    fine groups a flat ordering would give.  This is the layout the
    two-level scan (coarse supergroup tail + fine refinement) rides."""
    from .kmeans import kmeans

    N = keys.shape[0]
    T = N // bn
    vs = valid.reshape(T, bn)
    tile_keys = jax.random.split(jax.random.PRNGKey(seed), T)
    stride = bn // n_groups
    km = jax.jit(jax.vmap(
        # strided-row seeding skips the k-means++ sequential scan (rows are
        # already in geographic-cluster order, so strides are diverse)
        lambda k, p, v: kmeans(k, p, n_groups, iters=6, valid=v,
                               init_points=p[::stride])))
    # tiles are independent, so the vmap runs in tile chunks: the all-T
    # f32 feature tensor is a 5 GB spike at 1M rows (OOM on the 16 GB
    # chip), and chunking is bit-identical at every size
    TC_ = 256
    cs, as_ = [], []
    for lo in range(0, T, TC_):
        hi = min(lo + TC_, T)
        ks_c = (keys[lo * bn:hi * bn].astype(jnp.float32)
                .reshape(hi - lo, bn, -1))
        c, a = km(tile_keys[lo:hi], ks_c, vs[lo:hi])
        cs.append(c)
        as_.append(np.asarray(a))
    cent = jnp.concatenate(cs, axis=0)  # [T, n_groups, Dk]
    assign = np.concatenate(as_, axis=0)
    vn = np.asarray(vs)
    if n_super:
        sup_keys = jax.random.split(jax.random.PRNGKey(seed + 101), T)
        _, sup_of_fine = jax.vmap(
            lambda k, c: kmeans(k, c, n_super, iters=6,
                                init_points=c[:: n_groups // n_super])
        )(sup_keys, cent)  # [T, n_groups]
        sup_of_fine = np.asarray(sup_of_fine)
        sup = np.take_along_axis(sup_of_fine, assign, axis=1)  # [T, bn]
        label = sup * n_groups + assign
        n_labels = n_super * n_groups
    else:
        label = assign
        n_labels = n_groups
    # sort key: cluster label, invalid rows pushed past every label
    sort_key = label + (1.0 - vn) * (n_labels + 1)
    order = np.argsort(sort_key, axis=1, kind="stable")  # [T, bn]
    return (order + (np.arange(T) * bn)[:, None]).reshape(-1)


def _lowrank_centroid_factor(g_cat: jnp.ndarray, k: int):
    """Rank-k PCA factorization of a packed centroid operand: returns
    (coefficients [G, k] in the operand dtype, basis [k, d] f32) such that
    coefficients @ basis ~= g_cat.  Shared by the topk_lr (top-k selection)
    and sel_lr (feature-path selection+tail) build paths; zero pad rows
    project to zero coefficients."""
    C = g_cat.astype(jnp.float32)
    _, vecs = jnp.linalg.eigh(C.T @ C)
    p = vecs[:, -k:].T
    return (C @ p.T).astype(g_cat.dtype), p.astype(jnp.float32)


def build_hier_bank(bank: GeoBank, *, bn: int = 512, gsz_sem: int = 8,
                    gsz_geo: int = 64, gsz_super: int = 0,
                    tier: str = "fast", group_by: str = "key_value",
                    group_value_weight: float = 1.0,
                    lr_rank: Optional[int] = None,
                    lr_geo: Optional[int] = None,
                    res_rank: Optional[int] = None,
                    topk_gsz: int = 0, topk_lr: int = 0,
                    tail_super: int = 0, sel_lr: int = 0,
                    n_clusters: Optional[int] = None, iters: int = 8,
                    seed: int = 0, value_dtype=None,
                    shards: int = 1,
                    host_stage: Optional[bool] = None) -> HierBank:
    """Offline serving prep: cluster + reorder the bank, prepack operands.

    Bank prep is offline (like building the npz itself): geographic k-means
    reorder with dense packing (bank/clustered.py), within-tile key-space
    k-means reorder, then packed/derived operands computed on device.

    `shards > 1` prepares the bank for `parallel.sharded_retrieve_hier`:
    the tile count is padded so every mesh shard gets an identical
    t_pad/shards tile slab, and the row-level operands are padded to the
    full t_pad*bn (pad tiles are fully masked/zero, so a shard selecting
    one merely wastes that slot).
    """
    from ..bank.clustered import cluster_bank, tile_stats

    assert bn % gsz_sem == 0 and bn % gsz_geo == 0, (bn, gsz_sem, gsz_geo)
    # group blocks enter Pallas kernels as (bn/gsz, cat_d) tiles whose
    # sublane dim must be >= 8 (Mosaic block-shape rule)
    assert bn // gsz_sem >= 8 and bn // gsz_geo >= 8, (bn, gsz_sem, gsz_geo)
    if gsz_super:
        assert (bn % gsz_super == 0 and gsz_super % gsz_sem == 0
                and bn // gsz_super >= 8), (bn, gsz_super, gsz_sem)
    if topk_lr:
        assert topk_gsz, "topk_lr factors the topk_gsz stats operand — " \
            "build with topk_gsz set"
        topk_lr = min(topk_lr, int(bank.keys_sem.shape[1]))
    if topk_gsz:
        # topk groups must nest inside the key-coherent gsz_sem windows
        # the within-tile reorder produced, or the fine selection signal
        # silently degrades
        assert (bn % topk_gsz == 0 and bn // topk_gsz >= 8
                and gsz_sem % topk_gsz == 0), (bn, topk_gsz, gsz_sem)
        # both are hier_topk selection signals and its branch order would
        # silently ignore the fine topk operand when gsz_super is present
        # — building both wastes an operand and misleads (advisor r3 #3)
        assert not gsz_super, (
            "gsz_super and topk_gsz are mutually exclusive: both feed "
            "hier_topk's selection stage and gsz_super would win, leaving "
            "the topk_gsz operand built but unused")
    if tail_super:
        # the scan segment-sums fine-group exp-mass onto contiguous
        # tail_super/gsz_sem-group windows; the within-tile reorder already
        # makes consecutive fine groups key-coherent, so the windows are
        # value-coherent too
        assert (bn % tail_super == 0 and tail_super % gsz_sem == 0
                and tail_super > gsz_sem), (bn, tail_super, gsz_sem)
    if sel_lr:
        sel_lr = min(sel_lr, int(bank.keys_sem.shape[1]))
        if tail_super:
            # tail_super's fine-tail correction kernel computes its group
            # logits from the FULL centroids — it would not telescope
            # against a sketched scan tail
            raise ValueError("sel_lr and tail_super are mutually exclusive:"
                             " the supergroup correction kernel needs "
                             "full-width group logits")
    if tier == "exact" and bank.values.shape[0] > 262_144:
        import warnings
        warnings.warn(
            "tier='exact' keeps the [N, Dv] value intermediates f32 during "
            "the build (no bf16 memory relief above 256k rows) — expect a "
            "~2x higher HBM watermark than fast-tier builds at this scale",
            stacklevel=2)
    if lr_rank:
        # rank can't exceed the value width: the Gram eigenbasis has at
        # most Dv vectors, so a larger request silently built a Dv-rank
        # factor whose packed layout disagreed with the stored lr_rank
        # (serving crash on small-Dv banks).  Clamp once; everything
        # downstream (layout, u_sem, the serialized meta) stays consistent.
        lr_rank = min(lr_rank, int(bank.values.shape[1]))
    if lr_geo:
        lr_geo = min(lr_geo, int(bank.values.shape[1]))
    if res_rank:
        res_rank = min(res_rank, int(bank.values.shape[1]))
    if host_stage is None:
        # the device-resident build transiently holds ~3 bank copies
        # (PERF.md "Bank-scale validation": OOM at 1M rows on 16 GB HBM);
        # above ~0.5M rows the clustering/reorder/operand pipeline stages
        # through host RAM instead, streaming row chunks to the device
        host_stage = bank.values.shape[0] > 500_000
    if host_stage:
        return _build_hier_bank_hosted(
            bank, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
            gsz_super=gsz_super, tier=tier, group_by=group_by,
            group_value_weight=group_value_weight, lr_rank=lr_rank,
            lr_geo=lr_geo, res_rank=res_rank, topk_gsz=topk_gsz,
            topk_lr=topk_lr, tail_super=tail_super, sel_lr=sel_lr,
            n_clusters=n_clusters, iters=iters, seed=seed,
            value_dtype=value_dtype, shards=shards)
    cbank, _ = cluster_bank(bank, bn=bn, n_clusters=n_clusters, iters=iters,
                            seed=seed, pack="dense")
    # reorder rows within each tile so gsz_sem-row windows are key-coherent
    # (and, with gsz_super, nested inside key-coherent supergroup windows);
    # default group_by='key_value' clusters on [key | lam * v/|v|] so group
    # value sums stay value-pure (the tail-fidelity lever, fidelity_lab.py)
    if group_by == "key_value":
        # above ~256k rows the joint [N, Dk+Dv] f32 clustering features are
        # a multi-GB spike (5 GB at 1M — OOM on the 16 GB chip): window
        # k-means in bf16 there (assignment-insensitive to the rounding);
        # stay f32 at and below the recorded operating points so every
        # measured ordering/probe/recall number is bit-stable
        if cbank.num_rows > 262_144:
            # chunked + bf16: the f32 dequant/normalize intermediates are
            # themselves ~4 GB each at this scale
            CH = 131_072
            vparts = []
            for lo in range(0, cbank.num_rows, CH):
                vf = cbank.values[lo:lo + CH].astype(jnp.float32)
                if cbank.value_scale is not None:
                    vf = vf * cbank.value_scale[0, lo:lo + CH, None]
                vn = vf / jnp.maximum(
                    jnp.linalg.norm(vf, axis=1, keepdims=True), 1e-9)
                vparts.append((group_value_weight * vn)
                              .astype(jnp.bfloat16))
            gfeat = jnp.concatenate(
                [cbank.keys_sem.astype(jnp.bfloat16),
                 jnp.concatenate(vparts, axis=0)], axis=1)
        else:
            vf = dequantize_values(cbank)
            vn = vf / jnp.maximum(
                jnp.linalg.norm(vf, axis=1, keepdims=True), 1e-9)
            gfeat = jnp.concatenate(
                [cbank.keys_sem.astype(jnp.float32),
                 (group_value_weight * vn).astype(jnp.float32)], axis=1)
    elif group_by == "key":
        gfeat = cbank.keys_sem
    else:
        raise ValueError(f"group_by must be 'key' or 'key_value', "
                         f"got {group_by!r}")
    perm = _order_rows_within_tiles(
        gfeat, cbank.row_mask(), bn, bn // gsz_sem, seed + 1,
        n_super=bn // gsz_super if gsz_super else 0)

    def take(x):
        return x[perm] if x is not None else None

    cbank = dataclasses.replace(
        cbank,
        locs_lonlat=take(cbank.locs_lonlat),
        xyz=take(cbank.xyz),
        keys_sem=take(cbank.keys_sem),
        values=take(cbank.values),
        valid_mask=take(cbank.valid_mask),
        value_scale=(cbank.value_scale[:, perm]
                     if cbank.value_scale is not None else None),
    )
    import math

    N = cbank.num_rows
    T = N // bn
    # single-chip scans need tc | t_pad (tc <= TC); sharded scans need
    # tc | t_pad/shards — lcm keeps both with minimal tile padding
    t_pad = _round_up(T, math.lcm(TC, shards * 8))
    if shards > 1 and t_pad * bn > N:
        # equal per-shard slabs: pad the row-level operands with fully
        # masked zero rows out to t_pad*bn
        extra = t_pad * bn - N

        def padrows(x):
            return (jnp.pad(x, ((0, extra),) + ((0, 0),) * (x.ndim - 1))
                    if x is not None else None)

        cbank = dataclasses.replace(
            cbank,
            locs_lonlat=padrows(cbank.locs_lonlat),
            xyz=padrows(cbank.xyz),
            keys_sem=padrows(cbank.keys_sem),
            values=padrows(cbank.values),
            valid_mask=jnp.pad(
                cbank.valid_mask if cbank.valid_mask is not None
                else jnp.ones((N,), jnp.float32), (0, extra)),
            value_scale=(jnp.pad(cbank.value_scale, ((0, 0), (0, extra)))
                         if cbank.value_scale is not None else None),
        )
        N = t_pad * bn
        T = t_pad
    if shards > 1:
        # round-robin tile interleave: shard s owns tiles s, s+n, s+2n...
        # — geographically ADJACENT tiles land on DIFFERENT shards, so a
        # query's hot tiles spread across the mesh and every shard's
        # per-shard selection budget goes to tiles that matter (contiguous
        # latitude slabs concentrate a query's mass in one shard and starve
        # its K while the others select junk)
        t_local = t_pad // shards
        tile_of_pos = np.arange(t_pad).reshape(t_local, shards).T.reshape(-1)
        row_perm = (tile_of_pos[:, None] * bn
                    + np.arange(bn)[None, :]).reshape(-1)

        def take_rows(x):
            return x[row_perm] if x is not None else None

        cbank = dataclasses.replace(
            cbank,
            locs_lonlat=take_rows(cbank.locs_lonlat),
            xyz=take_rows(cbank.xyz),
            keys_sem=take_rows(cbank.keys_sem),
            values=take_rows(cbank.values),
            valid_mask=take_rows(cbank.valid_mask),
            value_scale=(cbank.value_scale[:, row_perm]
                         if cbank.value_scale is not None else None),
        )
    stats = tile_stats(cbank, bn)
    sem_d, cat_d = packed_dims(cbank.key_dim, tier)
    Dv = cbank.values.shape[1]
    Dvp = _round_up(Dv + 1, 128)
    vw_dtype = jnp.float32 if tier == "exact" else jnp.bfloat16

    def group_ops(feats, vals_f32, mask, gsz, geo: bool,
                  stats_only: bool = False):
        """Packed centroids [G_pad, cat_d] + value-sum/count [G_pad, Dvp]
        (vw is None under stats_only — the topk operand never needs the
        N x Dv value einsum)."""
        G = N // gsz
        G_pad = t_pad * (bn // gsz)
        mg = mask.reshape(G, gsz)
        cnt = mg.sum(axis=1)  # [G]
        w = mg / jnp.maximum(cnt, 1.0)[:, None]
        cg = jnp.einsum("gi,gid->gd", w,
                        feats.astype(jnp.float32).reshape(G, gsz, -1))
        vsum = (None if stats_only
                else jnp.einsum("gi,gid->gd", mg,
                                vals_f32.reshape(G, gsz, -1),
                                preferred_element_type=jnp.float32))

        def padg(x):
            return jnp.pad(x, ((0, G_pad - G), (0, 0)))

        Dk = cbank.key_dim
        # SLIM operands: the packed layout is [sem_d sem cols | geo cols
        # (pad to cat_d)], and each family's centroids are zero outside
        # its own block — store only the family's columns and contract
        # against the matching slice of the packed queries (the kernels
        # pick the slice from the operand's width, so legacy full-width
        # operands keep working)
        if geo:
            cat = pack_bank(jnp.zeros((G_pad, Dk), jnp.float32), padg(cg),
                            tier=tier)[:, sem_d:]
        else:
            cat = pack_bank(padg(cg), jnp.zeros((G_pad, 3), jnp.float32),
                            tier=tier)[:, :sem_d]
        if stats_only:
            return cat, None
        vw = jnp.concatenate(
            [padg(vsum), jnp.pad(cnt, (0, G_pad - G))[:, None],
             jnp.zeros((G_pad, Dvp - Dv - 1), jnp.float32)], axis=1)
        return cat, vw.astype(vw_dtype)

    @jax.jit
    def prep(cbank):
        from .retrieval_pallas import _split_hilo

        k_cat = pack_bank(cbank.keys_sem, cbank.xyz, tier=tier)
        mask = cbank.row_mask()
        mask_neg = (NEG * (1.0 - mask))[None, :].astype(jnp.float32)
        # above ~256k rows the [N, Dv] f32 value matrix is a 4+ GB
        # resident through every einsum below (async OOM at 1M rows on
        # the 16 GB chip, surfacing at the next sync): hold it bf16 there
        # — the reductions accumulate f32 via preferred_element_type, the
        # residual chunks upcast per 131k-row slice, and the serving vw
        # operands are stored bf16 anyway.  At and below the recorded
        # operating points everything stays f32/bit-stable.  tier='exact'
        # promises full-precision operands, so it never takes the bf16
        # path (it pays the f32 HBM watermark instead — advisor r3 #1).
        big = cbank.num_rows > 262_144 and tier != "exact"
        if big and cbank.value_scale is None:
            vals_f32 = (cbank.values.astype(jnp.bfloat16)
                        * mask[:, None].astype(jnp.bfloat16))
        else:
            vals_f32 = dequantize_values(cbank) * mask[:, None]
            if big:
                vals_f32 = vals_f32.astype(jnp.bfloat16)
        g_s = group_ops(cbank.keys_sem, vals_f32, mask, gsz_sem, geo=False)
        g_g = group_ops(cbank.xyz, vals_f32, mask, gsz_geo, geo=True)
        g_sup = (group_ops(cbank.keys_sem, vals_f32, mask, gsz_super,
                           geo=False) if gsz_super else (None, None))
        g_lr = (None, None)
        lr_coef_u = None
        if lr_rank:
            # rank-r basis of the fine-group value sums via the Dv x Dv
            # Gram eigendecomposition (cheaper + deterministic vs SVD of
            # [G, Dv]); coefficients + count ride one packed operand
            G = N // gsz_sem
            G_pad = t_pad * (bn // gsz_sem)
            mg = mask.reshape(G, gsz_sem)
            cnt = mg.sum(axis=1)
            vsum = jnp.einsum("gi,gid->gd", mg,
                              vals_f32.reshape(G, gsz_sem, -1),
                              preferred_element_type=jnp.float32)
            gram = vsum.T @ vsum
            _, vecs = jnp.linalg.eigh(gram)      # ascending eigenvalues
            u = vecs[:, -lr_rank:].T             # [r, Dv]
            coef = vsum @ u.T                    # [G, r]
            lr_coef_u = (coef, cnt, u)
            rp = _round_up(lr_rank + 1, 128)
            lrw = jnp.concatenate(
                [coef, cnt[:, None],
                 jnp.zeros((G, rp - lr_rank - 1), jnp.float32)], axis=1)
            lrw = jnp.pad(lrw, ((0, G_pad - G), (0, 0)))
            g_lr = (lrw.astype(vw_dtype), u.astype(jnp.float32))
        g_lrg = (None, None)
        lrg_coef_u = None
        if lr_geo:
            # low-rank GEO tail — same Gram factorization over the geo
            # family's group value sums (round 4; the geo tail matmul was
            # ~30% of scan flops at Dvp=1152)
            G = N // gsz_geo
            G_pad = t_pad * (bn // gsz_geo)
            mg = mask.reshape(G, gsz_geo)
            cnt = mg.sum(axis=1)
            vsum = jnp.einsum("gi,gid->gd", mg,
                              vals_f32.reshape(G, gsz_geo, -1),
                              preferred_element_type=jnp.float32)
            gram = vsum.T @ vsum
            _, vecs = jnp.linalg.eigh(gram)
            ug = vecs[:, -lr_geo:].T
            coef = vsum @ ug.T
            lrg_coef_u = (coef, cnt, ug)
            rpg = _round_up(lr_geo + 1, 128)
            lgw = jnp.concatenate(
                [coef, cnt[:, None],
                 jnp.zeros((G, rpg - lr_geo - 1), jnp.float32)], axis=1)
            lgw = jnp.pad(lgw, ((0, G_pad - G), (0, 0)))
            g_lrg = (lgw.astype(vw_dtype), ug.astype(jnp.float32))
        g_ts = (None, None)
        if tail_super:
            # weighted-supergroup sem tail operands (round 4): derived from
            # whichever operand the sem tail actually contracts (lr coords
            # when lr_rank is active — everything is linear).  ts_vw is the
            # per-supergroup MEAN of the member groups' vw rows, so the
            # scan's plain (unweighted) fine-exp segment-sum times ts_vw
            # approximates the fine tail; dvw restores it exactly on the
            # corrected tiles.
            src = (g_lr[0] if lr_rank else g_s[1]).astype(jnp.float32)
            ratio = tail_super // gsz_sem
            Gp, Wt = src.shape
            ts_vw = src.reshape(Gp // ratio, ratio, Wt).mean(axis=1)
            dvw = src - jnp.repeat(ts_vw, ratio, axis=0)
            g_ts = (ts_vw.astype(vw_dtype), dvw.astype(vw_dtype))
        g_res = (None, None, None, None)
        if res_rank:
            # residual-rank parts operands: the parts kernels reconstruct
            # exact row values as serving_group_mean + rank-k projected
            # residual, so R must be taken vs the SAME mean serving will
            # use — (coef/cnt)@u for the lr sem family, vsum/cnt otherwise.
            # The basis absorbs the lr mean-truncation residue too.
            rrp = _round_up(res_rank, 128)

            def fam_res(gsz, mean_lr):
                G = N // gsz
                Dv_ = vals_f32.shape[1]
                mg = mask.reshape(G, gsz)
                cnt = jnp.maximum(mg.sum(axis=1), 1.0)
                if mean_lr is not None:
                    coef, cnt_lr, u = mean_lr
                    vbar = (coef / jnp.maximum(cnt_lr, 1.0)[:, None]) @ u
                else:
                    vsum = jnp.einsum("gi,gid->gd", mg,
                                      vals_f32.reshape(G, gsz, -1),
                                      preferred_element_type=jnp.float32)
                    vbar = vsum / cnt[:, None]
                # chunked two-pass: the residual matrix R = (V - vbar_rep)
                # * mask is [N, Dv] f32 — materializing it (plus R @ w)
                # OOM'd HBM at 1M rows (two ~4 GB spikes on a 16 GB chip).
                # Pass 1 accumulates the Gram chunk-by-chunk; pass 2 emits
                # each chunk's rank-k coefficients.  Exact same math.
                target = max(1, (1 << 17) // gsz)   # ~131k rows per chunk
                gc = next(c for c in range(min(target, G), 0, -1)
                          if G % c == 0)
                n_ch = G // gc
                Vc = vals_f32.reshape(n_ch, gc, gsz, Dv_)
                mgc = mg.reshape(n_ch, gc, gsz)
                vbc = vbar.reshape(n_ch, gc, Dv_)

                def chunk_R(xs):
                    V, m, vb = xs
                    # per-chunk f32 upcast (V may be held bf16 at scale)
                    R = (V.astype(jnp.float32) - vb[:, None, :]) \
                        * m[..., None]
                    return R.reshape(gc * gsz, Dv_)

                def gpass(carry, xs):
                    R = chunk_R(xs)
                    return carry + R.T @ R, 0.0

                gram, _ = jax.lax.scan(gpass,
                                       jnp.zeros((Dv_, Dv_), jnp.float32),
                                       (Vc, mgc, vbc))
                _, vecs = jnp.linalg.eigh(gram)
                w = vecs[:, -res_rank:].T            # [k, Dv]

                def zpass(carry, xs):
                    return carry, chunk_R(xs) @ w.T

                _, z = jax.lax.scan(zpass, 0.0, (Vc, mgc, vbc))
                z = jnp.pad(z.reshape(N, res_rank),
                            ((0, 0), (0, rrp - res_rank)))
                w = jnp.pad(w, ((0, rrp - res_rank), (0, 0)))
                return z.astype(vw_dtype), w.astype(jnp.float32)

            zs, ws = fam_res(gsz_sem, lr_coef_u)
            zg, wg = fam_res(gsz_geo, lrg_coef_u)
            g_res = (zs, ws, zg, wg)
        # fine stats-only centroids for the top-k selection signal (no
        # value sums needed: the topk path never touches values)
        g_tk = (group_ops(cbank.keys_sem, None, mask, topk_gsz,
                          geo=False, stats_only=True)[0]
                if topk_gsz else None)
        g_tklr = (None, None)
        if topk_lr and g_tk is not None:
            # rank-k PCA of the packed fine centroids: the selection scan
            # contracts k instead of sem_d (round 5 — selection needs
            # ranking, not accurate logits; recall measured in PERF.md r5)
            g_tklr = _lowrank_centroid_factor(g_tk, topk_lr)
        kh, kl = _split_hilo(cbank.keys_sem.astype(jnp.float32))
        khl = jnp.concatenate([kh, kl], axis=1)  # [N, 2*Dk] bf16
        return (k_cat, mask_neg, g_s, g_g, g_sup, g_lr, g_lrg, g_ts, g_res,
                g_tk, g_tklr, khl)

    (k_cat, mask_neg, (g_sem_cat, g_sem_vw), (g_geo_cat, g_geo_vw),
     (g_sup_cat, g_sup_vw), (g_sem_vw_lr, u_sem), (g_geo_vw_lr, u_geo),
     (g_sem_ts_vw, g_sem_ts_dvw),
     (z_sem, w_sem, z_geo, w_geo), g_topk_cat, (g_topk_lr, p_topk),
     khl_sem) = prep(cbank)
    g_sem_sel = p_sel = None
    if sel_lr:
        sel_lr = min(sel_lr, g_sem_cat.shape[1])
        g_sem_sel, p_sel = _lowrank_centroid_factor(g_sem_cat, sel_lr)
    if cbank.value_scale is not None:
        values, scale = cbank.values, cbank.value_scale.astype(jnp.float32)
    elif value_dtype is not None:
        # explicit override (parity tests); serving default is bf16
        values, scale = cbank.values.astype(value_dtype), None
    else:
        values, scale = _serving_values(cbank.values, False), None
    return HierBank(
        bank=cbank, k_cat=k_cat, values=values, value_scale=scale,
        mask_neg=mask_neg,
        sem_centroid=stats.sem_centroid.astype(jnp.float32),
        geo_centroid=stats.geo_centroid.astype(jnp.float32),
        sem_radius=stats.sem_radius.astype(jnp.float32),
        geo_radius=stats.geo_radius.astype(jnp.float32),
        g_sem_cat=g_sem_cat, g_geo_cat=g_geo_cat,
        g_sem_vw=g_sem_vw, g_geo_vw=g_geo_vw, khl_sem=khl_sem,
        g_sup_cat=g_sup_cat, g_sup_vw=g_sup_vw,
        g_sem_vw_lr=g_sem_vw_lr, u_sem=u_sem,
        g_geo_vw_lr=g_geo_vw_lr, u_geo=u_geo,
        z_sem=z_sem, w_sem=w_sem, z_geo=z_geo, w_geo=w_geo,
        g_sem_ts_vw=g_sem_ts_vw, g_sem_ts_dvw=g_sem_ts_dvw,
        g_topk_cat=g_topk_cat, g_topk_lr=g_topk_lr, p_topk=p_topk,
        g_sem_sel=g_sem_sel, p_sel=p_sel,
        tier=tier, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
        gsz_super=gsz_super, lr_rank=lr_rank or 0,
        lr_geo=lr_geo or 0,
        res_rank=res_rank or 0, topk_gsz=topk_gsz, topk_lr=topk_lr or 0,
        tail_super=tail_super, sel_lr=sel_lr or 0,
        sem_d=sem_d, cat_d=cat_d, t_real=T, t_pad=t_pad,
    )


def _host_order_layout(bank: GeoBank, *, bn: int, gsz_sem: int,
                       gsz_super: int, group_by: str,
                       group_value_weight: float,
                       n_clusters: Optional[int], iters: int, seed: int,
                       shards: int):
    """Host-side ordering + layout shared by the host-staged and the
    mesh-distributed builds: geographic pack order, within-tile
    key(+value)-space reorder, shard padding + round-robin tile interleave.
    Returns host numpy arrays in the FINAL row layout plus (N, T, t_pad, RC).

    Bit-identical to the device build's ordering at the same seed (the
    per-tile k-means is chunk-stable; clustering features are bf16, the
    regime the big-bank builds always run in)."""
    import math

    assert group_by in ("key", "key_value"), group_by
    locs = np.asarray(bank.locs_lonlat, np.float32)
    xyz = np.asarray(bank.xyz, np.float32)
    keys = np.asarray(bank.keys_sem, np.float32)
    vals = np.asarray(bank.values)
    vscale = (np.asarray(bank.value_scale, np.float32)
              if bank.value_scale is not None else None)
    valid = np.asarray(bank.row_mask(), np.float32)

    from ..bank.clustered import geo_pack_order

    # 1. geographic clustering ([N, 3] is small on device at any scale);
    #    packing order + gather on HOST
    order = geo_pack_order(xyz, valid, bn, n_clusters=n_clusters,
                           iters=iters, seed=seed, pack="dense")
    sel = order >= 0
    idx0 = np.where(sel, order, 0)

    def take_h(x):
        if x is None:
            return None
        g = x[idx0].copy()
        g[~sel] = 0
        return g

    locs, xyz, keys, vals = (take_h(locs), take_h(xyz), take_h(keys),
                             take_h(vals))
    vscale = take_h(vscale.T).T if vscale is not None else None
    valid = sel.astype(np.float32)
    N = len(order)

    # 2. within-tile key(+value)-space ordering — the feature matrix is
    #    assembled host-side in bf16 chunks (the device build is also bf16
    #    in this row regime), the per-tile k-means already runs chunked
    RC = max(bn, (131_072 // bn) * bn)
    if group_by == "key_value":
        gparts = []
        for lo in range(0, N, RC):
            vc = jnp.asarray(vals[lo:lo + RC]).astype(jnp.float32)
            if vscale is not None:
                vc = vc * jnp.asarray(vscale[0, lo:lo + RC])[:, None]
            vn = vc / jnp.maximum(jnp.linalg.norm(vc, axis=1, keepdims=True),
                                  1e-9)
            gparts.append(np.asarray(jnp.concatenate(
                [jnp.asarray(keys[lo:lo + RC]).astype(jnp.bfloat16),
                 (group_value_weight * vn).astype(jnp.bfloat16)], axis=1)))
        gfeat = np.concatenate(gparts, axis=0)
        del gparts
    else:
        gfeat = keys
    perm = _order_rows_within_tiles(
        gfeat, valid, bn, bn // gsz_sem, seed + 1,
        n_super=bn // gsz_super if gsz_super else 0)
    del gfeat
    locs, xyz, keys, vals, valid = (locs[perm], xyz[perm], keys[perm],
                                    vals[perm], valid[perm])
    vscale = vscale[:, perm] if vscale is not None else None

    # 3. shard padding + round-robin tile interleave (host; same layout as
    #    the device build — see build_hier_bank)
    T = N // bn
    t_pad = _round_up(T, math.lcm(TC, shards * 8))
    if shards > 1 and t_pad * bn > N:
        extra = t_pad * bn - N

        def padrows(x):
            return (np.pad(x, ((0, extra),) + ((0, 0),) * (x.ndim - 1))
                    if x is not None else None)

        locs, xyz, keys, vals = (padrows(locs), padrows(xyz), padrows(keys),
                                 padrows(vals))
        valid = np.pad(valid, (0, extra))
        vscale = (np.pad(vscale, ((0, 0), (0, extra)))
                  if vscale is not None else None)
        N, T = t_pad * bn, t_pad
    if shards > 1:
        t_local = t_pad // shards
        tile_of_pos = np.arange(t_pad).reshape(t_local, shards).T.reshape(-1)
        row_perm = (tile_of_pos[:, None] * bn
                    + np.arange(bn)[None, :]).reshape(-1)
        locs, xyz, keys, vals, valid = (locs[row_perm], xyz[row_perm],
                                        keys[row_perm], vals[row_perm],
                                        valid[row_perm])
        vscale = vscale[:, row_perm] if vscale is not None else None
    return locs, xyz, keys, vals, vscale, valid, N, T, t_pad, RC


def _build_hier_bank_hosted(bank: GeoBank, *, bn: int, gsz_sem: int,
                            gsz_geo: int, gsz_super: int, tier: str,
                            group_by: str, group_value_weight: float,
                            lr_rank: Optional[int],
                            lr_geo: Optional[int],
                            res_rank: Optional[int],
                            topk_gsz: int, tail_super: int,
                            topk_lr: int = 0, sel_lr: int = 0,
                            n_clusters: Optional[int],
                            iters: int, seed: int, value_dtype,
                            shards: int) -> HierBank:
    """Host-staged `build_hier_bank`: the 1M+-row path (VERDICT r3 #5).

    The device-resident build transiently holds ~3 copies of the bank
    (source + reordered + prep intermediates) — ~9.4 GB at 1M rows of
    1024-d values, OOM on a 16 GB chip even though the SERVING set fits.
    This variant keeps the bank and every intermediate in host RAM,
    performs permutations/padding with numpy, and streams bn-aligned row
    chunks through the device for the compute-heavy pieces (dequantize,
    group sums, Gram accumulation, packing).  Only the final serving
    operands are placed on device, once.

    Numerical notes vs the device build: identical math and chunk-stable
    k-means; the clustering features are bf16 (the device build also goes
    bf16 above 256k rows — the only regime this path serves); Gram
    accumulation order differs (chunked adds vs one matmul), so eigenbases
    can differ by fp noise.  Parity is asserted in
    tests/test_hier.py::test_hosted_build_matches_device."""
    from ..bank.clustered import _tile_stats_impl

    locs, xyz, keys, vals, vscale, valid, N, T, t_pad, RC = \
        _host_order_layout(bank, bn=bn, gsz_sem=gsz_sem,
                           gsz_super=gsz_super, group_by=group_by,
                           group_value_weight=group_value_weight,
                           n_clusters=n_clusters, iters=iters, seed=seed,
                           shards=shards)
    stats = _tile_stats_impl(jnp.asarray(keys), jnp.asarray(xyz),
                             jnp.asarray(valid), bn=bn)
    sem_d, cat_d = packed_dims(keys.shape[1], tier)
    Dv = vals.shape[1]
    Dvp = _round_up(Dv + 1, 128)
    vw_dtype = jnp.float32 if tier == "exact" else jnp.bfloat16

    # 4. chunked per-row/per-group operands: one jitted pass per row chunk
    #    emits packed keys, hi/lo keys, serving values, and each family's
    #    raw group centroid/value-sum/count; results assemble on host
    gszs = [("sem", gsz_sem, False), ("geo", gsz_geo, True)]
    if gsz_super:
        gszs.append(("sup", gsz_super, False))
    if topk_gsz:
        gszs.append(("topk", topk_gsz, False))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chunk_ops(keys_c, xyz_c, vals_c, scale_c, mask_c, *, n: int):
        from .retrieval_pallas import _split_hilo

        vf = vals_c.astype(jnp.float32)
        if scale_c is not None:
            vf = vf * scale_c[:, None]
        vf = vf * mask_c[:, None]
        out = {"k_cat": pack_bank(keys_c, xyz_c, tier=tier),
               "khl": jnp.concatenate(_split_hilo(keys_c), axis=1)}
        for name, gsz, geo in gszs:
            G = n // gsz
            feats = xyz_c if geo else keys_c
            mg = mask_c.reshape(G, gsz)
            cnt = mg.sum(axis=1)
            w = mg / jnp.maximum(cnt, 1.0)[:, None]
            cg = jnp.einsum("gi,gid->gd", w,
                            feats.astype(jnp.float32).reshape(G, gsz, -1))
            out[f"cg_{name}"] = cg
            out[f"cnt_{name}"] = cnt
            if name != "topk":
                out[f"vsum_{name}"] = jnp.einsum(
                    "gi,gid->gd", mg, vf.reshape(G, gsz, -1),
                    preferred_element_type=jnp.float32)
        return out

    host = {}
    for lo in range(0, N, RC):
        hi = min(lo + RC, N)
        got = chunk_ops(jnp.asarray(keys[lo:hi]), jnp.asarray(xyz[lo:hi]),
                        jnp.asarray(vals[lo:hi]),
                        (jnp.asarray(vscale[0, lo:hi])
                         if vscale is not None else None),
                        jnp.asarray(valid[lo:hi]), n=hi - lo)
        for k_, v_ in got.items():
            host.setdefault(k_, []).append(np.asarray(v_))
    host = {k_: np.concatenate(v_, axis=0) for k_, v_ in host.items()}

    # 5. group operand packing (G-sized — small even at 1M rows)
    def pack_family(name, gsz, geo):
        G = N // gsz
        G_pad = t_pad * (bn // gsz)
        cg = jnp.asarray(host[f"cg_{name}"])
        cgp = jnp.pad(cg, ((0, G_pad - G), (0, 0)))
        Dk = keys.shape[1]
        if geo:
            cat = pack_bank(jnp.zeros((G_pad, Dk), jnp.float32), cgp,
                            tier=tier)[:, sem_d:]
        else:
            cat = pack_bank(cgp, jnp.zeros((G_pad, 3), jnp.float32),
                            tier=tier)[:, :sem_d]
        if name == "topk":
            return cat, None
        cnt = jnp.asarray(host[f"cnt_{name}"])
        vsum = jnp.asarray(host[f"vsum_{name}"])
        vw = jnp.concatenate(
            [vsum, cnt[:, None], jnp.zeros((G, Dvp - Dv - 1), jnp.float32)],
            axis=1)
        vw = jnp.pad(vw, ((0, G_pad - G), (0, 0)))
        return cat, vw.astype(vw_dtype)

    g_sem_cat, g_sem_vw = pack_family("sem", gsz_sem, False)
    g_geo_cat, g_geo_vw = pack_family("geo", gsz_geo, True)
    g_sup_cat, g_sup_vw = (pack_family("sup", gsz_super, False)
                           if gsz_super else (None, None))
    g_topk_cat = (pack_family("topk", topk_gsz, False)[0]
                  if topk_gsz else None)
    g_topk_lr = p_topk = None
    if topk_lr and g_topk_cat is not None:
        topk_lr = min(topk_lr, keys.shape[1])
        g_topk_lr, p_topk = _lowrank_centroid_factor(g_topk_cat, topk_lr)
    g_sem_sel = p_sel = None
    if sel_lr:
        sel_lr = min(sel_lr, g_sem_cat.shape[1])
        g_sem_sel, p_sel = _lowrank_centroid_factor(g_sem_cat, sel_lr)

    # 6. low-rank sem tail (G x Dv fits on device even at 1M rows/gsz 16)
    g_sem_vw_lr = u_sem = None
    lr_coef_u = None
    if lr_rank:
        G = N // gsz_sem
        G_pad = t_pad * (bn // gsz_sem)
        vsum = jnp.asarray(host["vsum_sem"])
        cnt = jnp.asarray(host["cnt_sem"])
        gram = vsum.T @ vsum
        _, vecs = jnp.linalg.eigh(gram)
        u = vecs[:, -lr_rank:].T
        coef = vsum @ u.T
        lr_coef_u = (coef, cnt, u)
        rp = _round_up(lr_rank + 1, 128)
        lrw = jnp.concatenate(
            [coef, cnt[:, None],
             jnp.zeros((G, rp - lr_rank - 1), jnp.float32)], axis=1)
        g_sem_vw_lr = jnp.pad(lrw, ((0, G_pad - G), (0, 0))).astype(vw_dtype)
        u_sem = u.astype(jnp.float32)

    g_geo_vw_lr = u_geo = None
    lrg_coef_u = None
    if lr_geo:
        G = N // gsz_geo
        G_pad = t_pad * (bn // gsz_geo)
        vsum = jnp.asarray(host["vsum_geo"])
        cnt = jnp.asarray(host["cnt_geo"])
        gram = vsum.T @ vsum
        _, vecs = jnp.linalg.eigh(gram)
        ug = vecs[:, -lr_geo:].T
        coef = vsum @ ug.T
        lrg_coef_u = (coef, cnt, ug)
        rpg = _round_up(lr_geo + 1, 128)
        lgw = jnp.concatenate(
            [coef, cnt[:, None],
             jnp.zeros((G, rpg - lr_geo - 1), jnp.float32)], axis=1)
        g_geo_vw_lr = jnp.pad(lgw, ((0, G_pad - G), (0, 0))).astype(vw_dtype)
        u_geo = ug.astype(jnp.float32)

    # weighted-supergroup sem tail operands (round 4; same derivation as
    # the device build — see build_hier_bank)
    g_sem_ts_vw = g_sem_ts_dvw = None
    if tail_super:
        src = (g_sem_vw_lr if lr_rank else g_sem_vw).astype(jnp.float32)
        ratio = tail_super // gsz_sem
        Gp, Wt = src.shape
        ts_vw = src.reshape(Gp // ratio, ratio, Wt).mean(axis=1)
        g_sem_ts_vw = ts_vw.astype(vw_dtype)
        g_sem_ts_dvw = (src - jnp.repeat(ts_vw, ratio, axis=0)
                        ).astype(vw_dtype)

    # 7. residual-rank parts: chunked two-pass Gram/coefficients, with the
    #    residual matrix never materialized beyond one chunk
    z_sem = w_sem = z_geo = w_geo = None
    if res_rank:
        rrp = _round_up(res_rank, 128)

        def fam_res(gsz, mean_lr, vsum_key, cnt_key):
            G = N // gsz
            if mean_lr is not None:
                coef, cnt_lr, u = mean_lr
                vbar = np.asarray((coef / jnp.maximum(cnt_lr, 1.0)[:, None])
                                  @ u)
            else:
                cnt = np.maximum(host[cnt_key], 1.0)
                vbar = host[vsum_key] / cnt[:, None]

            @functools.partial(jax.jit, static_argnames=("n",))
            def chunk_R(vals_c, scale_c, mask_c, vbar_c, *, n: int):
                vf = vals_c.astype(jnp.float32)
                if scale_c is not None:
                    vf = vf * scale_c[:, None]
                rep = jnp.repeat(vbar_c, gsz, axis=0)
                return (vf - rep) * mask_c[:, None]

            def chunks():
                for lo in range(0, N, RC):
                    hi = min(lo + RC, N)
                    yield chunk_R(
                        jnp.asarray(vals[lo:hi]),
                        (jnp.asarray(vscale[0, lo:hi])
                         if vscale is not None else None),
                        jnp.asarray(valid[lo:hi]),
                        jnp.asarray(vbar[lo // gsz:hi // gsz]), n=hi - lo)

            gram = jnp.zeros((Dv, Dv), jnp.float32)
            for R in chunks():
                gram = gram + R.T @ R
            _, vecs = jnp.linalg.eigh(gram)
            w = vecs[:, -res_rank:].T
            zs = [np.asarray((R @ w.T).astype(vw_dtype)) for R in chunks()]
            z = np.pad(np.concatenate(zs, axis=0),
                       ((0, 0), (0, rrp - res_rank)))
            return (jax.device_put(z),
                    jnp.pad(w, ((0, rrp - res_rank), (0, 0)))
                    .astype(jnp.float32))

        z_sem, w_sem = fam_res(gsz_sem, lr_coef_u, "vsum_sem", "cnt_sem")
        z_geo, w_geo = fam_res(gsz_geo, lrg_coef_u, "vsum_geo", "cnt_geo")

    # 8. final device placement.  bank.values SHARES the serving bf16 array
    #    (a second full-precision copy of the value matrix is exactly the
    #    memory this path exists to avoid; the exact-dense diagnostics in
    #    bench.py then read bf16 values — keys, the recall ground truth
    #    operand, stay f32)
    if vscale is not None:
        values = jax.device_put(vals)
        scale = jax.device_put(vscale.astype(np.float32))
        bank_values = values
    else:
        sv = value_dtype if value_dtype is not None else jnp.bfloat16
        # chunked host-side cast; one device_put of the final serving dtype
        # (a full-size f32->bf16 astype on device would hold both copies)
        cast = [np.asarray(jnp.asarray(vals[lo:lo + RC]).astype(sv))
                for lo in range(0, N, RC)]
        values = jax.device_put(np.concatenate(cast, axis=0))
        del cast
        scale = None
        bank_values = values
    cbank = GeoBank(
        locs_lonlat=jax.device_put(locs), xyz=jax.device_put(xyz),
        keys_sem=jax.device_put(keys), values=bank_values,
        n_valid=bank.n_valid, valid_mask=jax.device_put(valid),
        value_scale=scale,
    )
    mask_neg = jax.device_put(
        (NEG * (1.0 - valid))[None, :].astype(np.float32))
    khl = jax.device_put(host["khl"])
    k_cat = jax.device_put(host["k_cat"])
    return HierBank(
        bank=cbank, k_cat=k_cat, values=values, value_scale=scale,
        mask_neg=mask_neg,
        sem_centroid=stats.sem_centroid.astype(jnp.float32),
        geo_centroid=stats.geo_centroid.astype(jnp.float32),
        sem_radius=stats.sem_radius.astype(jnp.float32),
        geo_radius=stats.geo_radius.astype(jnp.float32),
        g_sem_cat=g_sem_cat, g_geo_cat=g_geo_cat,
        g_sem_vw=g_sem_vw, g_geo_vw=g_geo_vw, khl_sem=khl,
        g_sup_cat=g_sup_cat, g_sup_vw=g_sup_vw,
        g_sem_vw_lr=g_sem_vw_lr, u_sem=u_sem,
        g_geo_vw_lr=g_geo_vw_lr, u_geo=u_geo,
        z_sem=z_sem, w_sem=w_sem, z_geo=z_geo, w_geo=w_geo,
        g_sem_ts_vw=g_sem_ts_vw, g_sem_ts_dvw=g_sem_ts_dvw,
        g_topk_cat=g_topk_cat, g_topk_lr=g_topk_lr, p_topk=p_topk,
        g_sem_sel=g_sem_sel, p_sel=p_sel,
        tier=tier, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
        gsz_super=gsz_super, lr_rank=lr_rank or 0,
        lr_geo=lr_geo or 0,
        res_rank=res_rank or 0, topk_gsz=topk_gsz, topk_lr=topk_lr or 0,
        tail_super=tail_super, sel_lr=sel_lr or 0,
        sem_d=sem_d, cat_d=cat_d, t_real=T, t_pad=t_pad,
    )


def build_hier_bank_mesh(bank: GeoBank, mesh, *, bank_axis: Optional[str] = None,
                         bn: int = 512, gsz_sem: int = 8, gsz_geo: int = 64,
                         gsz_super: int = 0, tier: str = "fast",
                         group_by: str = "key_value",
                         group_value_weight: float = 1.0,
                         lr_rank: Optional[int] = None,
                         lr_geo: Optional[int] = None,
                         res_rank: Optional[int] = None,
                         topk_gsz: int = 0, topk_lr: int = 0,
                         tail_super: int = 0, sel_lr: int = 0,
                         n_clusters: Optional[int] = None, iters: int = 8,
                         seed: int = 0, value_dtype=None) -> HierBank:
    """MESH-distributed bank build for 10M+-row banks (round 5, VERDICT r4
    #7): returns a HierBank already sharded for `sharded_retrieve_hier`.

    The host-staged build (`_build_hier_bank_hosted`) bounds the single
    device's HBM by streaming row chunks, but every chunk still flows
    through ONE chip.  Here the ordering/layout stages run identically on
    the host (`_host_order_layout` — geo k-means on [N, 3] is cheap at any
    scale; the per-tile key k-means is chunk-bounded), and the
    memory/compute-heavy operand passes (packing, hi/lo split, group
    centroid/value-sum einsums, the lr/res Gram accumulations and residual
    projections) run as ONE SPMD program with the rows sharded over the
    mesh's `bank_axis` — per-device residency is N/n_shards rows, and the
    only cross-shard traffic is the two [Dv, Dv] Gram all-reduces.

    Operand parity vs the host-staged single-device build is exact for the
    row layout (same host ordering code) and fp-reassociation-class for
    the einsums/Grams (tests/test_hier.py::test_mesh_build_matches_hosted;
    4M-row run recorded in PERF.md round 5)."""
    if sel_lr and tail_super:
        raise ValueError("sel_lr and tail_super are mutually exclusive "
                         "(see build_hier_bank)")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..bank.clustered import _tile_stats_impl
    from .retrieval_pallas import _split_hilo

    bank_axis = bank_axis or mesh.axis_names[-1]
    shards = mesh.shape[bank_axis]
    if shards <= 1:
        return build_hier_bank(
            bank, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
            gsz_super=gsz_super, tier=tier, group_by=group_by,
            group_value_weight=group_value_weight, lr_rank=lr_rank,
            lr_geo=lr_geo, res_rank=res_rank, topk_gsz=topk_gsz,
            tail_super=tail_super, n_clusters=n_clusters, iters=iters,
            seed=seed, value_dtype=value_dtype, shards=1)
    assert bn % gsz_sem == 0 and bn % gsz_geo == 0, (bn, gsz_sem, gsz_geo)
    assert bn // gsz_sem >= 8 and bn // gsz_geo >= 8, (bn, gsz_sem, gsz_geo)
    Dv = int(bank.values.shape[1])
    if lr_rank:
        lr_rank = min(lr_rank, Dv)
    if lr_geo:
        lr_geo = min(lr_geo, Dv)
    if res_rank:
        res_rank = min(res_rank, Dv)

    locs, xyz, keys, vals, vscale, valid, N, T, t_pad, _ = \
        _host_order_layout(bank, bn=bn, gsz_sem=gsz_sem,
                           gsz_super=gsz_super, group_by=group_by,
                           group_value_weight=group_value_weight,
                           n_clusters=n_clusters, iters=iters, seed=seed,
                           shards=shards)
    # the shards>1 layout pads rows to whole equal slabs, so every group
    # family's G == G_pad and the SPMD reshapes below tile evenly per shard
    assert N == t_pad * bn, (N, t_pad, bn)

    rows = NamedSharding(mesh, P(bank_axis, None))
    rows1 = NamedSharding(mesh, P(bank_axis))
    cols = NamedSharding(mesh, P(None, bank_axis))
    rep = NamedSharding(mesh, P())
    keys_d = jax.device_put(keys, rows)
    xyz_d = jax.device_put(xyz, rows)
    locs_d = jax.device_put(locs, rows)
    valid_d = jax.device_put(valid, rows1)
    vals_d = jax.device_put(vals, rows)
    vscale_d = (jax.device_put(vscale.astype(np.float32), cols)
                if vscale is not None else None)
    del locs, xyz, keys, vals, valid
    stats = _tile_stats_impl(keys_d, xyz_d, valid_d, bn=bn)

    gszs = [("sem", gsz_sem, False), ("geo", gsz_geo, True)]
    if gsz_super:
        gszs.append(("sup", gsz_super, False))
    if topk_gsz:
        gszs.append(("topk", topk_gsz, False))
    sem_d, cat_d = packed_dims(keys_d.shape[1], tier)
    Dvp = _round_up(Dv + 1, 128)
    vw_dtype = jnp.float32 if tier == "exact" else jnp.bfloat16
    Dk = keys_d.shape[1]

    @jax.jit
    def prep_mesh(keys_, xyz_, vals_, scale_, mask_):
        vf = vals_.astype(jnp.float32)
        if scale_ is not None:
            vf = vf * scale_[0][:, None]
        vf = vf * mask_[:, None]
        out = {"k_cat": pack_bank(keys_, xyz_, tier=tier),
               "khl": jnp.concatenate(_split_hilo(keys_), axis=1),
               "mask_neg": (NEG * (1.0 - mask_))[None, :]}
        fam = {}
        for name, gsz, geo in gszs:
            G = N // gsz
            feats = xyz_ if geo else keys_
            mg = mask_.reshape(G, gsz)
            cnt = mg.sum(axis=1)
            w = mg / jnp.maximum(cnt, 1.0)[:, None]
            cg = jnp.einsum("gi,gid->gd", w,
                            feats.astype(jnp.float32).reshape(G, gsz, -1))
            if geo:
                cat = pack_bank(jnp.zeros((G, Dk), jnp.float32), cg,
                                tier=tier)[:, sem_d:]
            else:
                cat = pack_bank(cg, jnp.zeros((G, 3), jnp.float32),
                                tier=tier)[:, :sem_d]
            out[f"cat_{name}"] = cat
            if name == "sem" and sel_lr:
                # sharded-G Gram -> replicated basis; coefficients stay
                # row-sharded like the full operand (feature-path
                # selection+tail sketch, mirrors topk_lr below)
                out["g_sem_sel"], out["p_sel"] = _lowrank_centroid_factor(
                    cat, min(sel_lr, sem_d))
            if name == "topk":
                if topk_lr:
                    # sharded-G Gram -> replicated basis; coefficients
                    # stay row-sharded like the full operand
                    out["g_topk_lr"], out["p_topk"] = (
                        _lowrank_centroid_factor(cat, min(topk_lr, sem_d)))
                continue
            vsum = jnp.einsum("gi,gid->gd", mg, vf.reshape(G, gsz, -1),
                              preferred_element_type=jnp.float32)
            out[f"vw_{name}"] = jnp.concatenate(
                [vsum, cnt[:, None],
                 jnp.zeros((G, Dvp - Dv - 1), jnp.float32)],
                axis=1).astype(vw_dtype)
            fam[name] = (vsum, cnt, mg)

        lr_out = {}
        mean_lr = {}
        for name, r in (("sem", lr_rank), ("geo", lr_geo)):
            if not r:
                continue
            vsum, cnt, _ = fam[name]
            # sharded-G contraction -> replicated [Dv, Dv] Gram (the one
            # all-reduce of the build), replicated eigh
            gram = vsum.T @ vsum
            _, vecs = jnp.linalg.eigh(gram)
            u = vecs[:, -r:].T
            coef = vsum @ u.T
            mean_lr[name] = (coef, cnt, u)
            rp = _round_up(r + 1, 128)
            lr_out[f"lrw_{name}"] = jnp.concatenate(
                [coef, cnt[:, None], jnp.zeros((N // (gsz_sem if name ==
                 "sem" else gsz_geo), rp - r - 1), jnp.float32)],
                axis=1).astype(vw_dtype)
            lr_out[f"u_{name}"] = u.astype(jnp.float32)
        out.update(lr_out)

        if res_rank:
            rrp = _round_up(res_rank, 128)
            for name, gsz in (("sem", gsz_sem), ("geo", gsz_geo)):
                vsum, cnt, mg = fam[name]
                if name in mean_lr:
                    coef, cnt_lr, u = mean_lr[name]
                    vbar = (coef / jnp.maximum(cnt_lr, 1.0)[:, None]) @ u
                else:
                    vbar = vsum / jnp.maximum(cnt, 1.0)[:, None]
                R = ((vf.reshape(N // gsz, gsz, Dv) - vbar[:, None, :])
                     * mg[..., None]).reshape(N, Dv)
                gram = R.T @ R
                _, vecs = jnp.linalg.eigh(gram)
                w = vecs[:, -res_rank:].T
                out[f"z_{name}"] = jnp.pad(
                    R @ w.T, ((0, 0), (0, rrp - res_rank))).astype(vw_dtype)
                out[f"w_{name}"] = jnp.pad(
                    w, ((0, rrp - res_rank), (0, 0))).astype(jnp.float32)

        if tail_super:
            src = (lr_out["lrw_sem"] if lr_rank
                   else out["vw_sem"]).astype(jnp.float32)
            ratio = tail_super // gsz_sem
            Gp, Wt = src.shape
            ts_vw = src.reshape(Gp // ratio, ratio, Wt).mean(axis=1)
            out["ts_vw"] = ts_vw.astype(vw_dtype)
            out["ts_dvw"] = (src - jnp.repeat(ts_vw, ratio, axis=0)
                             ).astype(vw_dtype)
        return out

    got = prep_mesh(keys_d, xyz_d, vals_d, vscale_d, valid_d)
    if vscale is not None:
        values, scale = vals_d, vscale_d
    else:
        sv = value_dtype if value_dtype is not None else jnp.bfloat16
        values = jax.jit(lambda v: v.astype(sv),
                         out_shardings=rows)(vals_d)
        scale = None
    cbank = GeoBank(
        locs_lonlat=locs_d, xyz=xyz_d, keys_sem=keys_d, values=values,
        n_valid=jax.device_put(bank.n_valid, rep), valid_mask=valid_d,
        value_scale=scale,
    )

    def putr(x):
        return jax.device_put(x, rows) if x is not None else None

    hb = HierBank(
        bank=cbank, k_cat=putr(got["k_cat"]), values=values,
        value_scale=scale,
        mask_neg=jax.device_put(got["mask_neg"], cols),
        sem_centroid=jax.device_put(
            stats.sem_centroid.astype(jnp.float32), rep),
        geo_centroid=jax.device_put(
            stats.geo_centroid.astype(jnp.float32), rep),
        sem_radius=jax.device_put(stats.sem_radius.astype(jnp.float32), rep),
        geo_radius=jax.device_put(stats.geo_radius.astype(jnp.float32), rep),
        g_sem_cat=putr(got["cat_sem"]), g_geo_cat=putr(got["cat_geo"]),
        g_sem_vw=putr(got["vw_sem"]), g_geo_vw=putr(got["vw_geo"]),
        khl_sem=putr(got["khl"]),
        g_sup_cat=putr(got.get("cat_sup")), g_sup_vw=putr(got.get("vw_sup")),
        g_sem_vw_lr=putr(got.get("lrw_sem")),
        u_sem=(jax.device_put(got["u_sem"], rep) if lr_rank else None),
        g_geo_vw_lr=putr(got.get("lrw_geo")),
        u_geo=(jax.device_put(got["u_geo"], rep) if lr_geo else None),
        z_sem=putr(got.get("z_sem")),
        w_sem=(jax.device_put(got["w_sem"], rep) if res_rank else None),
        z_geo=putr(got.get("z_geo")),
        w_geo=(jax.device_put(got["w_geo"], rep) if res_rank else None),
        g_sem_ts_vw=putr(got.get("ts_vw")),
        g_sem_ts_dvw=putr(got.get("ts_dvw")),
        g_topk_cat=putr(got.get("cat_topk")),
        g_topk_lr=putr(got.get("g_topk_lr")),
        p_topk=(jax.device_put(got["p_topk"], rep)
                if "p_topk" in got else None),
        g_sem_sel=putr(got.get("g_sem_sel")),
        p_sel=(jax.device_put(got["p_sel"], rep)
               if "p_sel" in got else None),
        tier=tier, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
        gsz_super=gsz_super, lr_rank=lr_rank or 0, lr_geo=lr_geo or 0,
        res_rank=res_rank or 0, topk_gsz=topk_gsz,
        topk_lr=(min(topk_lr, sem_d) if topk_lr else 0),
        tail_super=tail_super,
        sel_lr=(min(sel_lr, sem_d) if sel_lr else 0),
        sem_d=sem_d, cat_d=cat_d, t_real=T, t_pad=t_pad,
    )
    return hb


# ---------------------------------------------------------------------------
# scan kernel: per-(query, tile) stats with no [B, G] HBM materialization


def _hier_scan_kernel(gpt_s, gpt_g, tc, has_geo, sup_r_s, qt_ref, gs_ref,
                      gg_ref, vs_ref, vg_ref, ms_ref, ss_ref, mg_ref, sg_ref,
                      tail_ref, accs_ref, accg_ref):
    """Both families' group logits for `tc` bank tiles; per-tile max logit
    (exp2 units, for the per-query argmax-tile signal) and exp-mass (for the
    mass-rank fill), PLUS the all-tiles group-centroid tail accumulation
    (e_group @ [value_sum | count]) — the tail does not depend on tile
    selection (the parts kernel later SUBTRACTS the selected tiles' group
    approximation), so it fuses here and the group logits are computed once.
    Group centroids are packed with the OTHER family's columns zeroed, so
    each family is one full-width matmul.  Logits are computed TRANSPOSED
    ([groups, queries]) so per-tile segments reduce along sublanes and stats
    write as (tc, bm) rows — Pallas TPU requires out-block lane dims
    divisible by 128, which per-query (bm, tc) stat blocks would violate;
    the tail matmul contracts the group dim of both operands directly."""
    c0 = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c0 == 0)
    def _():
        accs_ref[:] = jnp.zeros_like(accs_ref)
        if has_geo:
            accg_ref[:] = jnp.zeros_like(accg_ref)

    qt = qt_ref[:]
    # operand widths select the query slice: slim sem operands contract
    # the first ws rows, slim geo operands the LAST wg rows (full-width
    # legacy operands see the whole qt in both cases)
    ws = gs_ref.shape[1]
    wg = gg_ref.shape[1]
    sl = jnp.dot(gs_ref[:], qt[:ws], preferred_element_type=jnp.float32)
    es = jnp.exp2(jnp.minimum(sl, CLAMP2))
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    eg = jnp.exp2(jnp.minimum(gl, CLAMP2))
    # per-tile segment reductions, vectorized: [tc*gpt, bm] -> [tc, gpt, bm]
    # splits the sublane dim only (minor dim untouched — a free relayout on
    # Mosaic), so all tc tiles' stats reduce in ONE vector op per stat
    # instead of 4*tc strided slice-reductions serializing the tail matmuls
    bm_ = sl.shape[1]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    ss_ref[:] = jnp.sum(es.reshape(tc, gpt_s, bm_), axis=1)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    sg_ref[:] = jnp.sum(eg.reshape(tc, gpt_g, bm_), axis=1)
    # tail: contract the group dim of es [G_tc, bm] with vw [G_tc, Dvp]
    vs = vs_ref[:]
    if sup_r_s:
        # weighted-supergroup tail (round 4): fine exp-mass segment-sums
        # onto sup_r_s-group windows (splits the sublane dim only — free on
        # Mosaic, like the stats) and the tail matmul contracts sup_r_s x
        # fewer rows against the supergroup-mean operand g_sem_ts_vw
        esup = es.reshape(tc * gpt_s // sup_r_s, sup_r_s, bm_).sum(axis=1)
        accs_ref[:] += jax.lax.dot_general(
            esup.astype(vs.dtype), vs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        accs_ref[:] += jax.lax.dot_general(
            es.astype(vs.dtype), vs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if has_geo:
        vg = vg_ref[:]
        accg_ref[:] += jax.lax.dot_general(
            eg.astype(vg.dtype), vg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c0 == nc - 1)
    def _():
        Ws = accs_ref.shape[1]  # families may have different tail widths
        tail_ref[:, :Ws] = accs_ref[:]  # (low-rank sem vs full geo)
        if has_geo:
            tail_ref[:, Ws:] = accg_ref[:]
        else:
            tail_ref[:, Ws:] = jnp.zeros_like(tail_ref[:, Ws:])


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g",
                                             "has_geo", "sup_r_s",
                                             "interpret"))
def _hier_scan_call(q_cat, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
                    bm: int, tc: int, gpt_s: int, gpt_g: int,
                    has_geo: bool = True, sup_r_s: int = 0,
                    interpret: bool = False):
    """sup_r_s > 0: g_sem_vw is the SUPERGROUP tail operand (gpt_s/sup_r_s
    rows per tile — hb.g_sem_ts_vw); the kernel segment-sums the fine
    exp-mass onto supergroups before the tail matmul (round 4)."""
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    assert t_pad % tc == 0, (t_pad, tc)
    Ws = g_sem_vw.shape[1]  # per-family tail widths (sem may be low-rank)
    Wg = g_geo_vw.shape[1]
    nB = Bp // bm
    grid = (nB, t_pad // tc)
    q_t = q_cat.T  # [cat_d, Bp]
    gpt_vs = gpt_s // sup_r_s if sup_r_s else gpt_s

    out = pl.pallas_call(
        functools.partial(_hier_scan_kernel, gpt_s, gpt_g, tc, has_geo,
                          sup_r_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cat_d, bm), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_s, g_sem_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, g_geo_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_vs, Ws), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, Wg), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tc, bm), lambda i, c: (c, i),
                                memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((bm, Ws + Wg), lambda i, c: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t_pad, Bp), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((Bp, Ws + Wg), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((bm, Ws), jnp.float32),
            pltpu.VMEM((bm, Wg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * t_pad * (gpt_s * cat_d + gpt_vs * Ws
                                    + gpt_g * (cat_d + Wg)),
            bytes_accessed=(nB * t_pad * (gpt_s * cat_d + gpt_vs * Ws
                                          + gpt_g * (cat_d + Wg)) * 2
                            + Bp * cat_d * 2 + 4 * Bp * t_pad * 4
                            + Bp * (Ws + Wg) * 4),
            transcendentals=Bp * t_pad * (gpt_s + gpt_g),
        ),
        interpret=interpret,
    )(q_t, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw)
    # stats back to [Bp, t_pad] for the per-query top-k in select_tiles
    return tuple(o.T for o in out[:4]) + (out[4],)


def _hier_scan_stats_kernel(gpt_s, gpt_g, tc, qt_ref, gs_ref, gg_ref,
                            ms_ref, ss_ref, mg_ref, sg_ref):
    """Stats-only variant of the fused scan (no tail accumulation): per-tile
    max group logit + exp-mass for both families.  The top-k path uses this
    — it never needs the group value sums."""
    qt = qt_ref[:]
    ws = gs_ref.shape[1]
    wg = gg_ref.shape[1]
    sl = jnp.dot(gs_ref[:], qt[:ws], preferred_element_type=jnp.float32)
    es = jnp.exp2(jnp.minimum(sl, CLAMP2))
    gl = jnp.dot(gg_ref[:], qt[qt.shape[0] - wg:],
                 preferred_element_type=jnp.float32)
    eg = jnp.exp2(jnp.minimum(gl, CLAMP2))
    # per-tile segment reductions, vectorized: [tc*gpt, bm] -> [tc, gpt, bm]
    # splits the sublane dim only (minor dim untouched — a free relayout on
    # Mosaic), so all tc tiles' stats reduce in ONE vector op per stat
    # instead of 4*tc strided slice-reductions serializing the tail matmuls
    bm_ = sl.shape[1]
    ms_ref[:] = jnp.max(sl.reshape(tc, gpt_s, bm_), axis=1)
    ss_ref[:] = jnp.sum(es.reshape(tc, gpt_s, bm_), axis=1)
    mg_ref[:] = jnp.max(gl.reshape(tc, gpt_g, bm_), axis=1)
    sg_ref[:] = jnp.sum(eg.reshape(tc, gpt_g, bm_), axis=1)


@functools.partial(jax.jit, static_argnames=("bm", "tc", "gpt_s", "gpt_g",
                                             "interpret"))
def _hier_scan_stats_call(q_cat, g_sem_cat, g_geo_cat, *, bm: int, tc: int,
                          gpt_s: int, gpt_g: int, interpret: bool = False):
    Bp, cat_d = q_cat.shape
    t_pad = g_sem_cat.shape[0] // gpt_s
    assert t_pad % tc == 0, (t_pad, tc)
    nB = Bp // bm
    grid = (nB, t_pad // tc)
    q_t = q_cat.T

    out = pl.pallas_call(
        functools.partial(_hier_scan_stats_kernel, gpt_s, gpt_g, tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cat_d, bm), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_s, g_sem_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc * gpt_g, g_geo_cat.shape[1]),
                         lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tc, bm), lambda i, c: (c, i),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((t_pad, Bp), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * t_pad * (gpt_s + gpt_g) * cat_d,
            bytes_accessed=(nB * t_pad * (gpt_s + gpt_g) * cat_d * 2
                            + Bp * cat_d * 2 + 4 * Bp * t_pad * 4),
            transcendentals=Bp * t_pad * (gpt_s + gpt_g),
        ),
        interpret=interpret,
    )(q_t, g_sem_cat, g_geo_cat)
    return tuple(o.T for o in out)


def _hier_argmax_kernel(Dk, idx_ref, q2_ref, ql_ref, khl_ref, mask_ref,
                        out_ref, best_ref, bidx_ref):
    """Semantic argmax over each query tile's selected bank tiles at ~f32
    logit accuracy: logit = qh.kh + qh.kl + ql.kh via ONE [bm, 2Dk] matmul
    (q2 = [qh|qh] against khl = [kh|kl]) plus a [bm, Dk] matmul (ql against
    the kh half).  Running (max, arg) carried in scratch; indices are exact
    in f32 (N < 2^24)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, NEG)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    khl = khl_ref[:]
    bn = khl.shape[0]
    l = jnp.dot(q2_ref[:], khl.T, preferred_element_type=jnp.float32)
    l += jnp.dot(ql_ref[:], khl[:, :Dk].T, preferred_element_type=jnp.float32)
    l += mask_ref[:]
    m = jnp.max(l, axis=1, keepdims=True)  # [bm, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    amax = jnp.min(jnp.where(l >= m, iota, bn), axis=1, keepdims=True)
    i = pl.program_id(0)
    row0 = idx_ref[i, j] * bn
    better = m > best_ref[:]
    bidx_ref[:] = jnp.where(better, (amax + row0).astype(jnp.float32),
                            bidx_ref[:])
    best_ref[:] = jnp.maximum(best_ref[:], m)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, 0:1] = best_ref[:]
        out_ref[:, 1:2] = bidx_ref[:]
        out_ref[:, 2:] = jnp.zeros_like(out_ref[:, 2:])


def _hier_topk_kernel(Dk, k, idx_ref, q2_ref, ql_ref, khl_ref, mask_ref,
                      out_ref, best_ref, bidx_ref):
    """k-carry variant of `_hier_argmax_kernel`: running per-query top-k
    (scores + rows) over the selected bank tiles.  The running list is
    UNSORTED — each tile contributes its own top-k via k sequential masked
    maxes, each inserted by replacing the list's current minimum when it
    beats it (the invariant "holds the k best so far" survives because a
    tile's successive maxes are non-increasing).  VPU cost is ~k
    masked-max passes over the [bm, bn] logits per tile — small next to
    the kernel's 3 matmuls for k <= 8.  Indices ride as f32 (N < 2^24)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, NEG)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    khl = khl_ref[:]
    bn = khl.shape[0]
    l = jnp.dot(q2_ref[:], khl.T, preferred_element_type=jnp.float32)
    l += jnp.dot(ql_ref[:], khl[:, :Dk].T, preferred_element_type=jnp.float32)
    l += mask_ref[:]
    i = pl.program_id(0)
    row0 = (idx_ref[i, j] * bn).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (l.shape[0], k), 1)
    best = best_ref[:]
    bidx = bidx_ref[:]
    for _ in range(k):
        m = jnp.max(l, axis=1, keepdims=True)  # [bm, 1]
        amax = jnp.min(jnp.where(l >= m, iota, bn), axis=1, keepdims=True)
        l = jnp.where(iota == amax, NEG, l)
        cmin = jnp.min(best, axis=1, keepdims=True)  # [bm, 1]
        cpos = jnp.min(jnp.where(best <= cmin, kiota, k), axis=1,
                       keepdims=True)
        put = (m > cmin) & (kiota == cpos)
        best = jnp.where(put, m, best)
        bidx = jnp.where(put, amax.astype(jnp.float32) + row0, bidx)
    best_ref[:] = best
    bidx_ref[:] = bidx

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, :k] = best_ref[:]
        out_ref[:, k:2 * k] = bidx_ref[:]
        out_ref[:, 2 * k:] = jnp.zeros_like(out_ref[:, 2 * k:])


@functools.partial(jax.jit, static_argnames=("Dk", "k", "bm", "bn",
                                             "interpret"))
def _hier_topk_call(q2, ql, khl, mask_neg, idx, *, Dk: int, k: int, bm: int,
                    bn: int, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the k-carry kernel; returns (scores [Bp, k], rows [Bp, k] int32)
    sorted descending by score."""
    Bp = q2.shape[0]
    nB = Bp // bm
    K = idx.shape[1]
    grid = (nB, K)

    def kidx(i, g, idx_):
        return (idx_[i, g], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 2 * Dk), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, Dk), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 2 * Dk), kidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 128), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.float32),
            pltpu.VMEM((bm, k), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hier_topk_kernel, Dk, k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * bn * 3 * Dk,
            bytes_accessed=nB * K * bn * 2 * Dk * 2 + Bp * 3 * Dk * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, q2, ql, khl, mask_neg)
    # sort each query's unsorted k-list descending (ties keep kernel order)
    scores, sel = jax.lax.top_k(out[:, :k], k)
    rows = jnp.take_along_axis(out[:, k:2 * k].astype(jnp.int32), sel, axis=1)
    return scores, rows


@functools.partial(jax.jit, static_argnames=("Dk", "bm", "bn", "interpret"))
def _hier_argmax_call(q2, ql, khl, mask_neg, idx, *, Dk: int, bm: int,
                      bn: int, interpret: bool = False) -> jnp.ndarray:
    Bp = q2.shape[0]
    nB = Bp // bm
    K = idx.shape[1]
    grid = (nB, K)

    def kidx(i, g, idx_):
        return (idx_[i, g], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 2 * Dk), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, Dk), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 2 * Dk), kidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 128), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hier_argmax_kernel, Dk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * bn * 3 * Dk,
            bytes_accessed=nB * K * bn * 2 * Dk * 2 + Bp * 3 * Dk * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, q2, ql, khl, mask_neg)
    return out


def _topk_budget(B: int, k_tiles: int, bm: int, j_sem: int
                 ) -> Tuple[int, int, int]:
    """Small-batch auto-widening for the top-k SERVING endpoint
    (VERDICT r3 #4).  Selection tiles are shared by bm geographically-sorted
    queries; small batches span too much sphere per tile and recall
    collapses (measured on the 100k flagship bank, tools/r4_smallb_topk.py:
    B=512 at the bench config K48/bm256 -> recall@1 0.539!).  The measured
    restorative budget: bm=128 plus 3x tiles / j+4 below 2048 queries
    (B=512: 1.0000 at 1.16 ms) and 2x tiles / j+2 below 8192 (B=2048:
    0.9995); at serving scale the base budget already holds >= 0.999.
    Returns (k_tiles, bm, j_sem)."""
    if B < 2048:
        return 3 * k_tiles, min(bm, 128), j_sem + 4
    if B < 8192:
        return 2 * k_tiles, min(bm, 128), j_sem + 2
    return k_tiles, bm, j_sem


@functools.partial(jax.jit, static_argnames=(
    "k", "k_tiles", "m_tiles", "bm", "tc", "j_sem", "j_geo", "mode", "sort",
    "auto_widen", "interpret"))
def hier_topk(q_sem: jnp.ndarray, q_xyz: Optional[jnp.ndarray], hb: HierBank,
              *, k: int = 1, k_tiles: int = 56,
              m_tiles: Optional[int] = None, bm: int = 256, tc: int = 16,
              j_sem: int = 6, j_geo: int = 2, mode: str = "range",
              sort: str = "geo", auto_widen: bool = True,
              interpret: bool = False) -> jnp.ndarray:
    """Serving top-k retrieval: [B] int32 bank rows for k=1 (the default),
    [B, k] rows sorted by descending serving-tier logit for 2 <= k <= 8
    (the k-carry kernel `_hier_topk_kernel`; rows beyond the selected
    tiles can never appear, same selection guarantee as k=1).

    The recall-critical endpoint: big-K hierarchical tile selection (the
    scan's group stats; no value work) + exact semantic argmax over the
    selected tiles at hi/lo ~f32 logit accuracy (`khl_sem`).  The big K
    buys the selection headroom the feature path spends on value matmuls —
    recall@1 vs f32-exact NN is MEASURED in bench.py (target >= 0.999;
    round-2 on the 100k informative bank: K=40 -> 0.9986 @ 1.70M q/s,
    K=56 (default) -> 0.9992 @ 1.46M q/s, K=80 -> 0.9994 @ 1.16M q/s).
    `mode='range'` spends every selected tile on the semantic family (the
    recall metric's family); q_xyz (when given) only drives the geographic
    query sort.

    `auto_widen` (default on) applies `_topk_budget`'s small-batch policy —
    B is static under jit, so the widening is a compile-time choice exactly
    like the feature path's (models/range_encoder.py)."""
    B = q_sem.shape[0]
    if auto_widen:
        k_tiles, bm, j_sem = _topk_budget(B, k_tiles, bm, j_sem)
    q_s, q_x = _pad_queries(q_sem, q_xyz, hb, bm)
    q_cat = pack_queries(q_s, None if mode == "range" else q_x, 12.0, 40.0,
                         tier=hb.tier)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    Dk = hb.bank.key_dim

    from .retrieval_pallas import _split_hilo

    qh, ql = _split_hilo(q_s)
    q2 = jnp.concatenate([qh, qh], axis=1)  # [Bp, 2*Dk]

    use2 = bool(hb.gsz_super) and hb.g_sup_cat is not None
    inv = None
    if q_x is not None:
        order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                              hb.t_pad, sort="geo")
        inv = jnp.argsort(order)
        q_cat, q2, ql = q_cat[order], q2[order], ql[order]
    if use2:
        m_s, s_s, m_g, s_g = _hier_scan_stats_call(
            q_cat, hb.g_sup_cat, hb.g_geo_cat, bm=bm, tc=tc,
            gpt_s=hb.bn // hb.gsz_super, gpt_g=gpt_g, interpret=interpret)
    elif hb.g_topk_lr is not None and hb.topk_lr:
        # low-rank selection signal (round 5): project the packed queries
        # onto the fine centroids' PCA basis once (~free) and contract k
        # instead of sem_d in the stats matmul — selection needs ranking
        # quality, not accurate logits; recall measured in PERF.md r5
        q_sel = jnp.dot(q_cat[:, :hb.sem_d].astype(jnp.float32),
                        hb.p_topk.T,
                        preferred_element_type=jnp.float32)
        q_tk = jnp.concatenate([q_sel.astype(q_cat.dtype),
                                q_cat[:, hb.sem_d:]], axis=1)
        m_s, s_s, m_g, s_g = _hier_scan_stats_call(
            q_tk, hb.g_topk_lr, hb.g_geo_cat, bm=bm, tc=tc,
            gpt_s=hb.bn // hb.topk_gsz, gpt_g=gpt_g, interpret=interpret)
    elif hb.g_topk_cat is not None and hb.topk_gsz:
        # fine stats-only centroids: restores the selection signal a
        # coarse feature-tail gsz_sem costs (gsz16 needs K=64 for the
        # 0.999 recall bar; gsz8 stats hold it at K=40)
        m_s, s_s, m_g, s_g = _hier_scan_stats_call(
            q_cat, hb.g_topk_cat, hb.g_geo_cat, bm=bm, tc=tc,
            gpt_s=hb.bn // hb.topk_gsz, gpt_g=gpt_g, interpret=interpret)
    else:
        m_s, s_s, m_g, s_g = _hier_scan_stats_call(
            q_cat, hb.g_sem_cat, hb.g_geo_cat, bm=bm, tc=tc, gpt_s=gpt_s,
            gpt_g=gpt_g, interpret=interpret)
    if q_x is None:
        home = _home_tile(m_s, hb.t_real)
        order = _hybrid_order(None, home, B, hb.t_pad, sort=sort)
        inv = jnp.argsort(order)
        q_cat, q2, ql = q_cat[order], q2[order], ql[order]
        m_s, s_s = m_s[order], s_s[order]
        m_g, s_g = m_g[order], s_g[order]
    if use2:
        # coarse selection of M, fine refine stats, K <= M final selection
        # — the selection fidelity of the one-level fine scan at a fraction
        # of its cost (stats-only refine reads no value operands)
        mt = min(m_tiles or 2 * k_tiles, hb.t_real)
        idx_m, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                                k_tiles=mt, bm=bm, n_valid=B, j_sem=j_sem,
                                j_geo=j_geo, mode=mode)
        m_f, s_f, _ = _hier_refine_call(
            q_cat, idx_m, hb.g_sem_cat, hb.g_sup_cat, None, None, bm=bm,
            gpt_f=gpt_s, gpt_sup=hb.bn // hb.gsz_super, stats_only=True,
            interpret=interpret)
        mg_at = _gather_cols(m_g, idx_m, bm)
        sg_at = _gather_cols(s_g, idx_m, bm)
        idx_loc, _ = select_tiles(m_f, s_f, mg_at, sg_at, t_real=mt,
                                  k_tiles=min(k_tiles, mt), bm=bm, n_valid=B,
                                  j_sem=j_sem, j_geo=j_geo, mode=mode)
        idx = jnp.take_along_axis(idx_m, idx_loc, axis=1)
    else:
        idx, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                              k_tiles=k_tiles, bm=bm, n_valid=B, j_sem=j_sem,
                              j_geo=j_geo, mode=mode)
    if k == 1:
        out = _hier_argmax_call(q2, ql, hb.khl_sem, hb.mask_neg, idx, Dk=Dk,
                                bm=bm, bn=hb.bn, interpret=interpret)
        best = out[:, 1].astype(jnp.int32)
        return best[inv[:B]] if inv is not None else best[:B]
    _, rows = _hier_topk_call(q2, ql, hb.khl_sem, hb.mask_neg, idx, Dk=Dk,
                              k=k, bm=bm, bn=hb.bn, interpret=interpret)
    return rows[inv[:B]] if inv is not None else rows[:B]


def select_tiles(m_s, s_s, m_g, s_g, *, t_real: int, k_tiles: int, bm: int,
                 n_valid: int, j_sem: int = 2, j_geo: int = 2,
                 mode: str = "range+") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile selection from the scan stats ([Bp, t_pad] f32).

    Two signals per family:
      1. per-query top-`j` tiles by MAX group logit -> unioned over the bm
         queries of a query tile (the per-query argmax guarantee: the true
         argmax row's tile carries its hottest group);
      2. estimated tile mass: per-query sum-normalized exp-mass summed over
         the tile's queries — ranks the cap/fill so the least-mass tiles
         are dropped first.

    Returns (idx [nB, K] int32 — distinct; sel [nB, t_pad] f32 one-hot)."""
    Bp, t_pad = m_s.shape
    nB = Bp // bm
    k_tiles = min(k_tiles, t_real)
    row_valid = jnp.arange(Bp) < n_valid
    col_real = jnp.arange(t_pad) < t_real

    def rank_weights(m, j):
        # scatter-free top-j rank weights: counting met thresholds gives
        # weight (j - rank) for a query's top-j tiles, 0 elsewhere — so when
        # the union over the tile's bm queries oversubscribes k_tiles, every
        # query's rank-0 (argmax-guarantee) tile outranks any rank-1+ tile,
        # which in turn outranks mass-only fill.  Thresholds come from j
        # successive masked max reductions (lax.top_k is a sort on TPU —
        # measurably slower for j <= 4; value ties only widen the selection)
        m = jnp.where(col_real[None, :], m, -jnp.inf)
        w = jnp.zeros_like(m)
        rem = m
        for _ in range(j):
            thr = jnp.max(rem, axis=1, keepdims=True)
            w = w + (m >= thr).astype(jnp.float32)
            rem = jnp.where(rem >= thr, -jnp.inf, rem)
        w = jnp.where(row_valid[:, None], w, 0.0)
        return w.reshape(nB, bm, t_pad).max(axis=1)

    def tile_mass(s):
        s = jnp.where(col_real[None, :], s, 0.0)
        p = s / jnp.maximum(jnp.sum(s, axis=1, keepdims=True), 1e-30)
        p = jnp.where(row_valid[:, None], p, 0.0)
        return p.reshape(nB, bm, t_pad).sum(axis=1)

    sel = rank_weights(m_s, j_sem)
    pri = tile_mass(s_s)
    if mode == "range+":
        sel = jnp.maximum(sel, rank_weights(m_g, j_geo))
        pri = pri + tile_mass(s_g)

    big = 1e9
    score = jnp.where(col_real[None, :], sel * big + pri, -jnp.inf)
    _, idx = jax.lax.top_k(score, k_tiles)
    idx = idx.astype(jnp.int32)
    sel = jnp.zeros((nB, t_pad), jnp.float32)
    sel = sel.at[jnp.arange(nB)[:, None], idx].set(1.0)
    return idx, sel


def _dedup_union(idx: jnp.ndarray, f: int, k_union: int) -> jnp.ndarray:
    """Merge each f adjacent query blocks' rank-ordered tile lists into one
    deduplicated union list [nB/f, k_union] (round 5 — the tile-dedup lever).

    After the geographic sort, adjacent bm-query blocks select heavily
    overlapping tile lists; the parts kernels' work is #dispatches = #blocks
    x K, so merging f blocks into one f*bm-query dispatch with the union
    list costs #blocks/f x k_union — a f*K/k_union work cut (measured ~1.9x
    at the flagship point, tools/r5_overlap.py).  Fidelity can only improve:
    every query keeps at least its own block's tiles (an exact tile replaces
    the tail approximation — strictly better), unless k_union truncates, in
    which case the RANK-MAJOR interleave below guarantees every block keeps
    its ~k_union/f highest-ranked tiles.

    Unused slots REPEAT the previous entry; the parts kernels skip a grid
    step whose scalar-prefetched tile equals the previous one (consecutive
    duplicates occur only as this padding — select_tiles emits distinct
    lists), so padding costs the block fetch but no compute."""
    nB, K = idx.shape
    nS = nB // f
    assert nS * f == nB, (nB, f)
    k_union = min(k_union, f * K)
    # rank-major interleave: column order = (rank0 of block 0..f-1, rank1 of
    # block 0..f-1, ...) so truncation drops globally-low ranks first
    m = idx.reshape(nS, f, K).transpose(0, 2, 1).reshape(nS, f * K)
    # mark duplicates: stable sort by tile id keeps the highest-priority
    # (earliest) copy unmarked
    pos = jnp.argsort(m, axis=1, stable=True)
    srt = jnp.take_along_axis(m, pos, axis=1)
    dup_srt = jnp.concatenate(
        [jnp.zeros((nS, 1), bool), srt[:, 1:] == srt[:, :-1]], axis=1)
    dup = jnp.zeros_like(dup_srt).at[
        jnp.arange(nS)[:, None], pos].set(dup_srt)
    # distinct entries keep their column priority; dups sort last
    cols = jnp.arange(f * K)[None, :]
    prio = jnp.where(dup, f * K + cols, cols)
    order = jnp.argsort(prio, axis=1)[:, :k_union]
    out = jnp.take_along_axis(m, order, axis=1)
    n_distinct = jnp.sum(~dup, axis=1, keepdims=True)
    # pad slots repeat the last distinct tile (kernel-side dup skip)
    last = jnp.take_along_axis(
        out, jnp.minimum(n_distinct - 1, k_union - 1), axis=1)
    out = jnp.where(cols[:, :k_union] < n_distinct, out, last)
    return out.astype(jnp.int32)


# ---------------------------------------------------------------------------
# refine kernel: fine-minus-supergroup tail correction + fine stats over the
# M tiles phase-1 (coarse) selection kept — the middle level of the
# two-level pipeline (see retrieve_hier's level=2 path)


def _hier_refine_kernel(Mp, has_parts, idx_ref, q_ref, gf_ref, gsup_ref,
                        *rest):
    """Per selected tile: fine-group sem logits -> per-(query, tile) max
    logit + exp-mass stats (the K-selection signal, at the same fidelity
    the one-level scan had), and optionally the tail CORRECTION partial
    sum_j (A_fine(t_j) - A_sup(t_j)) — replacing the coarse scan's
    supergroup approximation with the fine one on the M tiles that matter.
    Stats accumulate into [bm, Mp] scratch via one-hot outer products
    (Mosaic has no dynamic lane store); partials into [bm, Dvp] scratch.
    Everything dumps once at the last grid step."""
    if has_parts:
        vf_ref, vsup_ref, stat_ref, part_ref, sm_ref, ss_ref, acc_ref = rest
    else:
        stat_ref, sm_ref, ss_ref = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        sm_ref[:] = jnp.full_like(sm_ref, NEG)
        ss_ref[:] = jnp.zeros_like(ss_ref)
        if has_parts:
            acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]
    wf = gf_ref.shape[1]
    lf = jnp.dot(q[:, :wf], gf_ref[:].T,
                 preferred_element_type=jnp.float32)
    ef = jnp.exp2(jnp.minimum(lf, CLAMP2))
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1) == j
          ).astype(jnp.float32)
    m_col = jnp.max(lf, axis=1, keepdims=True)  # [bm, 1]
    s_col = jnp.sum(ef, axis=1, keepdims=True)
    # max stat: scratch starts at NEG; one-hot blend keeps other columns
    sm_ref[:] = jnp.where(oh > 0, m_col, sm_ref[:])
    ss_ref[:] += s_col * oh
    if has_parts:
        ls = jnp.dot(q[:, :gsup_ref.shape[1]], gsup_ref[:].T,
                     preferred_element_type=jnp.float32)
        es = jnp.exp2(jnp.minimum(ls, CLAMP2))
        vf = vf_ref[:]
        acc_ref[:] += jax.lax.dot_general(
            ef.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vsup = vsup_ref[:]
        acc_ref[:] -= jax.lax.dot_general(
            es.astype(vsup.dtype), vsup, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        stat_ref[:, :Mp] = sm_ref[:]
        stat_ref[:, Mp:] = ss_ref[:]
        if has_parts:
            part_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "gpt_f", "gpt_sup",
                                             "stats_only", "interpret"))
def _hier_refine_call(q_cat, idx, g_sem_cat, g_sup_cat, g_sem_vw, g_sup_vw,
                      *, bm: int, gpt_f: int, gpt_sup: int,
                      stats_only: bool = False, interpret: bool = False):
    """Returns (m_f [Bp, M], s_f [Bp, M]) fine stats over the selected
    tiles, plus (when not stats_only) the [Bp, Dvp] fine-minus-super tail
    correction partial (count column at Dv, like the scan tail)."""
    Bp, cat_d = q_cat.shape
    nB = Bp // bm
    M = idx.shape[1]
    Mp = _round_up(M, 128)
    grid = (nB, M)

    in_specs = [
        pl.BlockSpec((bm, cat_d), lambda i, g, idx_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_f, g_sem_cat.shape[1]),
                     lambda i, g, idx_: (idx_[i, g], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_sup, g_sup_cat.shape[1]),
                     lambda i, g, idx_: (idx_[i, g], 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q_cat, g_sem_cat, g_sup_cat]
    out_specs = [pl.BlockSpec((bm, 2 * Mp), lambda i, g, idx_: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((Bp, 2 * Mp), jnp.float32)]
    scratch = [pltpu.VMEM((bm, Mp), jnp.float32),
               pltpu.VMEM((bm, Mp), jnp.float32)]
    if not stats_only:
        Dvp = g_sem_vw.shape[1]
        in_specs += [
            pl.BlockSpec((gpt_f, Dvp), lambda i, g, idx_: (idx_[i, g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt_sup, Dvp), lambda i, g, idx_: (idx_[i, g], 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [g_sem_vw, g_sup_vw]
        out_specs.append(pl.BlockSpec((bm, Dvp), lambda i, g, idx_: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Bp, Dvp), jnp.float32))
        scratch = scratch + [pltpu.VMEM((bm, Dvp), jnp.float32)]
        # scratch order in the kernel: stat dump uses sm/ss, then acc
        scratch = [scratch[0], scratch[1], scratch[2]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        scratch_shapes=scratch,
    )
    Dvp = 0 if stats_only else g_sem_vw.shape[1]
    out = pl.pallas_call(
        functools.partial(_hier_refine_kernel, Mp, not stats_only),
        grid_spec=grid_spec,
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * M * (gpt_f + gpt_sup) * (cat_d + Dvp),
            bytes_accessed=nB * M * (gpt_f + gpt_sup) * (cat_d + Dvp) * 2
            + Bp * cat_d * 2,
            transcendentals=Bp * M * (gpt_f + gpt_sup),
        ),
        interpret=interpret,
    )(idx, *operands)
    if stats_only:
        return out[:, :M], out[:, Mp:Mp + M], None
    stats, parts = out
    return stats[:, :M], stats[:, Mp:Mp + M], parts


def _hier_corr_kernel(idx_ref, q_ref, g_ref, dvw_ref, out_ref, acc_ref):
    """Fine-minus-supergroup tail correction over the scalar-prefetched
    tile list (round 4, tail_super): acc += exp2(q . g_fine) @ dvw, where
    dvw[g] = vw[g] - ts_vw[sup(g)].  On the corrected tiles
    scan_supergroup_tail + this == the fine-group tail exactly, so the
    parts kernel's fine-approximation subtraction stays telescopically
    exact.  dvw's count column is 0 by construction: the correction never
    touches the softmax denominator."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]
    gw = g_ref.shape[1]
    e = jnp.exp2(jnp.minimum(
        jnp.dot(q[:, :gw], g_ref[:].T, preferred_element_type=jnp.float32),
        CLAMP2))
    dv = dvw_ref[:]
    acc_ref[:] += jnp.dot(e.astype(dv.dtype), dv,
                          preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "gpt", "interpret"))
def _hier_corr_call(q_cat, idx, g_cat, dvw, *, bm: int, gpt: int,
                    interpret: bool = False) -> jnp.ndarray:
    """[Bp, W] tail correction to ADD to the scan's supergroup sem tail —
    one group-granularity pass over the M selected tiles (gpt rows each,
    ~bn/gpt x cheaper per tile than an exact parts tile)."""
    Bp, cat_d = q_cat.shape
    W = dvw.shape[1]
    nB = Bp // bm
    M = idx.shape[1]
    grid = (nB, M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, cat_d), lambda i, g, idx_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, g_cat.shape[1]),
                         lambda i, g, idx_: (idx_[i, g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, W), lambda i, g, idx_: (idx_[i, g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, W), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, W), jnp.float32)],
    )
    return pl.pallas_call(
        _hier_corr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * M * gpt * (g_cat.shape[1] + W),
            bytes_accessed=nB * M * gpt * (g_cat.shape[1] + W) * 2
            + Bp * (cat_d + W) * 4,
            transcendentals=Bp * M * gpt,
        ),
        interpret=interpret,
    )(idx, q_cat, g_cat, dvw)


def _hier_parts_family_kernel(sem_d, has_scale, lr, geo, rr, lrr, dv,
                              dedup_pad, sel, idx_ref, q_ref, k_ref, v_ref,
                              gs_ref, vs_ref, *rest):
    """Single-family variant of `_hier_parts_kernel`: exact one-family
    softmax partials minus that family's group approximation over the
    scalar-prefetched tile list.  Splitting families lets the sem exact
    budget (K_sem, the probe-fidelity knob) grow without paying the geo
    value matmul on every tile — the geo family is sharply local and needs
    only a few exact tiles of its own (`k_geo`).

    `rr` (res_rank active): the [bn, Dv] value stream/matmul is replaced by
    the mean+residual identity  p@V = (segsum(p)/cnt)@vsum + (p@z)@w  with
    w applied ONCE outside the grid — v_ref then holds z [bn, rrp] and the
    kernel accumulates az = p@z; the mean term and the group-approx
    subtraction ride ONE [bm, gpt] matmul on their difference (both are
    group-granularity), and the merged cnt column replaces the in-kernel
    sum(p) denominator accumulation.

    Out layouts:  plain: [acc(Dv) | d | pad(127)]
                  lr:    [acc(Dv) | d | pad(127) | alr(W)]
                  rr+lr: [az(rrp) | d | pad(127) | alr(W)]   (no Dv acc)
                  rr:    [acc(Dv) | d | pad(127) | az(rrp)]."""
    if has_scale and not rr:
        s_ref, mask_ref, out_ref, acc_ref, d_ref, *xtr = rest
    else:
        mask_ref, out_ref, acc_ref, d_ref, *xtr = rest
    i0 = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        d_ref[:] = jnp.zeros_like(d_ref)
        for x in xtr:
            x[:] = jnp.zeros_like(x)

    # dedup-padding skip (static: only when a dedup-merged list can carry
    # repeat-padding): _dedup_union pads its merged tile lists by REPEATING
    # the previous entry (select_tiles lists are always distinct, so a
    # consecutive duplicate can only be padding) — skip the step's compute;
    # processing a tile twice would double its (exact - approx) telescope
    # term
    def _body():
        q = q_ref[:]
        k = k_ref[:]
        mask = mask_ref[:]
        prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
        if geo:
            logits = jnp.dot(q[:, sem_d:], k[:, sem_d:].T,
                             preferred_element_type=jnp.float32,
                             precision=prec) + mask
        else:
            logits = jnp.dot(q[:, :sem_d], k[:, :sem_d].T,
                             preferred_element_type=jnp.float32,
                             precision=prec) + mask
        p = jnp.exp2(jnp.minimum(logits, CLAMP2))

        gw = gs_ref.shape[1]
        # `sel` (round 5, sel_lr): the sem group operand is the rank-k
        # selection sketch and the projected queries ride APPENDED to
        # q_cat (the first sem_d columns must stay exact for the row
        # logits above) — the group logits here then match the scan's
        # sketched logits EXACTLY, preserving the telescoping identity
        qg = (q[:, q.shape[1] - gw:] if (geo or sel) else q[:, :gw])
        e = jnp.exp2(jnp.minimum(
            jnp.dot(qg, gs_ref[:].T, preferred_element_type=jnp.float32),
            CLAMP2))
        vs = vs_ref[:]

        if rr:
            z = v_ref[:]
            bn, gpt = k.shape[0], gs_ref.shape[0]
            gsz = bn // gpt
            # static 0/1 segment matrix (rows -> fine groups), built in
            # registers: ps = segment-sums of p as ONE bf16 MXU matmul
            sgm = (jax.lax.broadcasted_iota(jnp.int32, (bn, gpt), 0) // gsz
                   == jax.lax.broadcasted_iota(jnp.int32, (bn, gpt), 1))
            ps = jnp.dot(p.astype(z.dtype), sgm.astype(z.dtype),
                         preferred_element_type=jnp.float32)
            cnt = vs[:, lrr if lr else dv].astype(jnp.float32)
            psn = ps / jnp.maximum(cnt, 1.0)[None, :]
            if lr:
                # alr accumulates (approx - mean) in lr coords; its cnt
                # column then carries e@cnt - sum(p), so corr = tails - alr
                # restores the exact denominator downstream (no in-kernel
                # sum(p))
                xtr[0][:] += jnp.dot((e - psn).astype(vs.dtype), vs,
                                     preferred_element_type=jnp.float32)
            else:
                dvv = jnp.dot((psn - e).astype(vs.dtype), vs,
                              preferred_element_type=jnp.float32)
                acc_ref[:] += dvv[:, :dv]
                d_ref[:] += dvv[:, dv:dv + 1]
            az = acc_ref if (rr and lr) else xtr[-1]
            az[:] += jnp.dot(p.astype(z.dtype), z,
                             preferred_element_type=jnp.float32)
        else:
            d_ref[:] += jnp.sum(p, axis=-1, keepdims=True)
            Dv = v_ref.shape[1]
            if has_scale:
                s = s_ref[:]
                v = v_ref[:].astype(jnp.bfloat16)
                acc_ref[:] += jnp.dot((p * s).astype(jnp.bfloat16), v,
                                      preferred_element_type=jnp.float32)
            else:
                v = v_ref[:]
                vprec = (jax.lax.Precision.HIGHEST if v.dtype == jnp.float32
                         else None)
                acc_ref[:] += jnp.dot(p.astype(v.dtype), v,
                                      preferred_element_type=jnp.float32,
                                      precision=vprec)
            appr = jnp.dot(e.astype(vs.dtype), vs,
                           preferred_element_type=jnp.float32)
            if lr:
                xtr[0][:] += appr
            else:
                acc_ref[:] -= appr[:, :Dv]
                d_ref[:] -= appr[:, Dv:Dv + 1]

    if dedup_pad:
        dup = (j > 0) & (idx_ref[i0, j] == idx_ref[i0, jnp.maximum(j - 1, 0)])
        pl.when(jnp.logical_not(dup))(_body)
    else:
        _body()

    @pl.when(j == nj - 1)
    def _():
        A = acc_ref.shape[1]
        out_ref[:, :A] = acc_ref[:]
        out_ref[:, A:A + 1] = d_ref[:]
        out_ref[:, A + 1:A + 128] = jnp.zeros_like(out_ref[:, A + 1:A + 128])
        off = A + 128
        for x in xtr:
            xw = x.shape[1]
            out_ref[:, off:off + xw] = x[:]
            off += xw


@functools.partial(jax.jit, static_argnames=("sem_d", "bm", "bn", "gpt",
                                             "geo", "lr", "rr", "lrr",
                                             "dedup_pad", "sel",
                                             "interpret"))
def _hier_parts_family_call(q_cat, k_cat, values, scale, mask_neg, idx,
                            g_cat, g_vw, z=None, *, sem_d: int, bm: int,
                            bn: int, gpt: int, geo: bool = False,
                            lr: bool = False, rr: int = 0, lrr: int = 0,
                            dedup_pad: bool = False, sel: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    Bp, cat_d = q_cat.shape
    N, Dv = values.shape
    W = g_vw.shape[1]
    nB = Bp // bm
    K = idx.shape[1]
    assert idx.shape == (nB, K), (idx.shape, nB)
    grid = (nB, K)

    def kidx(i, g, idx_):
        return (idx_[i, g], 0)

    rrp = z.shape[1] if rr else 0
    # q and k widths may differ: with `sel`, q carries the rank-k query
    # sketch appended past cat_d (the k operand stays cat_d wide)
    in_specs = [
        pl.BlockSpec((bm, cat_d), lambda i, g, idx_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, k_cat.shape[1]), kidx, memory_space=pltpu.VMEM),
        # the residual path replaces the [bn, Dv] value stream with the
        # [bn, rrp] residual coefficients in the same operand slot
        pl.BlockSpec((bn, rrp if rr else Dv), kidx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt, g_cat.shape[1]), kidx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt, W), kidx, memory_space=pltpu.VMEM),
    ]
    operands = [q_cat, k_cat, z if rr else values, g_cat, g_vw]
    has_scale = scale is not None and not rr
    if has_scale:
        in_specs.append(pl.BlockSpec((1, bn),
                                     lambda i, g, idx_: (0, idx_[i, g]),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    in_specs.append(pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                                 memory_space=pltpu.VMEM))
    operands.append(mask_neg)

    if rr and lr:
        out_w = rrp + 128 + W
        scratch = [pltpu.VMEM((bm, rrp), jnp.float32),
                   pltpu.VMEM((bm, 1), jnp.float32),
                   pltpu.VMEM((bm, W), jnp.float32)]
    elif rr:
        out_w = Dv + 128 + rrp
        scratch = [pltpu.VMEM((bm, Dv), jnp.float32),
                   pltpu.VMEM((bm, 1), jnp.float32),
                   pltpu.VMEM((bm, rrp), jnp.float32)]
    else:
        out_w = Dv + 128 + (W if lr else 0)
        scratch = [pltpu.VMEM((bm, Dv), jnp.float32),
                   pltpu.VMEM((bm, 1), jnp.float32)]
        if lr:
            scratch.append(pltpu.VMEM((bm, W), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_w), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    # rr row-cols: residual matmul (rrp) + segment-sum matmul (gpt)
    vw_cols = (rrp + gpt) if rr else Dv
    out = pl.pallas_call(
        functools.partial(_hier_parts_family_kernel, sem_d, has_scale, lr,
                          geo, rr, lrr, Dv, dedup_pad, sel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * (bn * (cat_d // 2 + vw_cols)
                                + gpt * (cat_d + W)),
            bytes_accessed=nB * K * (bn + gpt) * (cat_d + (rrp if rr else Dv)
                                                  ) * 2
            + Bp * (cat_d + Dv) * 4,
            transcendentals=Bp * K * (bn + gpt),
        ),
        interpret=interpret,
    )(idx, *operands)
    return out


def _hier_parts_kernel(sem_d, has_scale, lr, idx_ref, q_ref, k_ref, v_ref,
                       gs_ref, gg_ref, vs_ref, vg_ref, *rest):
    """Per selected bank tile: EXACT dual-softmax partials MINUS the tile's
    group-centroid approximation (the same formula the fused scan's tail
    accumulated for ALL tiles) — so `scan_tail + sum_sel(exact - approx)`
    replaces the selected tiles' approximation with the exact computation
    with no keep-mask pass over the full bank.  Grid (iB, K); the bank-side
    block index maps follow the scalar-prefetched idx list.  Emits
    UNNORMALIZED [bm, 2*Dv + 128] partials ([sem_acc | geo_acc | d_sem |
    d_geo | pad]) — bounded logits make plain sums safe (see
    retrieval_pallas.py), so everything combines linearly outside.

    `lr`: the sem group values are LOW-RANK coefficients (vs_ref [gpt_s,
    rp], count in its last used column) — the sem approximation then
    accumulates in coefficient space into a separate [bm, rp] output and
    the caller subtracts `(scan_tail_lr - parts_approx_lr) @ U` outside
    (everything is linear, so the unprojection commutes with the sums)."""
    if has_scale:
        s_ref, mask_ref, out_ref, acc_ref, ds_ref, dg_ref, *alr = rest
    else:
        mask_ref, out_ref, acc_ref, ds_ref, dg_ref, *alr = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        if lr:
            alr[0][:] = jnp.zeros_like(alr[0])

    q = q_ref[:]
    k = k_ref[:]
    mask = mask_ref[:]
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s_logits = jnp.dot(q[:, :sem_d], k[:, :sem_d].T,
                       preferred_element_type=jnp.float32, precision=prec) + mask
    g_logits = jnp.dot(q[:, sem_d:], k[:, sem_d:].T,
                       preferred_element_type=jnp.float32, precision=prec) + mask
    p_s = jnp.exp2(jnp.minimum(s_logits, CLAMP2))
    p_g = jnp.exp2(jnp.minimum(g_logits, CLAMP2))
    ds_ref[:] += jnp.sum(p_s, axis=-1, keepdims=True)
    dg_ref[:] += jnp.sum(p_g, axis=-1, keepdims=True)
    Dv = v_ref.shape[1]
    if has_scale:
        s = s_ref[:]  # [1, bn] f32 dequant scales fold into probabilities
        v = v_ref[:].astype(jnp.bfloat16)
        acc_ref[:, :Dv] += jnp.dot((p_s * s).astype(jnp.bfloat16), v,
                                   preferred_element_type=jnp.float32)
        acc_ref[:, Dv:] += jnp.dot((p_g * s).astype(jnp.bfloat16), v,
                                   preferred_element_type=jnp.float32)
    else:
        v = v_ref[:]
        vprec = jax.lax.Precision.HIGHEST if v.dtype == jnp.float32 else None
        acc_ref[:, :Dv] += jnp.dot(p_s.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32,
                                   precision=vprec)
        acc_ref[:, Dv:] += jnp.dot(p_g.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32,
                                   precision=vprec)

    # subtract this tile's group-centroid approximation (counted once in the
    # scan's all-tiles tail); the count column (Dv of vw) carries the
    # denominator correction
    es = jnp.exp2(jnp.minimum(
        jnp.dot(q[:, :gs_ref.shape[1]], gs_ref[:].T,
                preferred_element_type=jnp.float32), CLAMP2))
    vs = vs_ref[:]
    appr_s = jnp.dot(es.astype(vs.dtype), vs,
                     preferred_element_type=jnp.float32)
    if lr:
        # coefficient-space accumulation; unprojection happens outside
        alr[0][:] += appr_s
    else:
        acc_ref[:, :Dv] -= appr_s[:, :Dv]
        ds_ref[:] -= appr_s[:, Dv:Dv + 1]
    eg = jnp.exp2(jnp.minimum(
        jnp.dot(q[:, q.shape[1] - gg_ref.shape[1]:], gg_ref[:].T,
                preferred_element_type=jnp.float32), CLAMP2))
    vg = vg_ref[:]
    appr_g = jnp.dot(eg.astype(vg.dtype), vg,
                     preferred_element_type=jnp.float32)
    acc_ref[:, Dv:] -= appr_g[:, :Dv]
    dg_ref[:] -= appr_g[:, Dv:Dv + 1]

    @pl.when(j == nj - 1)
    def _():
        Dv2 = 2 * Dv
        out_ref[:, :Dv2] = acc_ref[:]
        out_ref[:, Dv2:Dv2 + 1] = ds_ref[:]
        out_ref[:, Dv2 + 1:Dv2 + 2] = dg_ref[:]
        if lr:
            rp = alr[0].shape[1]
            out_ref[:, Dv2 + 2:Dv2 + 128] = jnp.zeros_like(
                out_ref[:, Dv2 + 2:Dv2 + 128])
            out_ref[:, Dv2 + 128:Dv2 + 128 + rp] = alr[0][:]
        else:
            out_ref[:, Dv2 + 2:] = jnp.zeros_like(out_ref[:, Dv2 + 2:])


@functools.partial(jax.jit, static_argnames=("sem_d", "bm", "bn", "gpt_s",
                                             "gpt_g", "lr", "interpret"))
def _hier_parts_call(q_cat, k_cat, values, scale, mask_neg, idx,
                     g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw, *,
                     sem_d: int, bm: int, bn: int, gpt_s: int, gpt_g: int,
                     lr: bool = False, interpret: bool = False
                     ) -> jnp.ndarray:
    """lr=True: g_sem_vw holds low-rank coefficients [G, rp]; the output
    grows by rp columns carrying the coefficient-space sem approximation
    (out layout [sem | geo | d_s | d_g | pad(126) | alr])."""
    Bp, cat_d = q_cat.shape
    N, Dv = values.shape
    Ws = g_sem_vw.shape[1]
    Wg = g_geo_vw.shape[1]
    nB = Bp // bm
    K = idx.shape[1]
    assert idx.shape == (nB, K), (idx.shape, nB)
    grid = (nB, K)

    def kidx(i, g, idx_):
        return (idx_[i, g], 0)

    in_specs = [
        pl.BlockSpec((bm, cat_d), lambda i, g, idx_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, cat_d), kidx, memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, Dv), kidx, memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_s, g_sem_cat.shape[1]), kidx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_g, g_geo_cat.shape[1]), kidx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_s, Ws), kidx, memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt_g, Wg), kidx, memory_space=pltpu.VMEM),
    ]
    operands = [q_cat, k_cat, values, g_sem_cat, g_geo_cat, g_sem_vw, g_geo_vw]
    has_scale = scale is not None
    if has_scale:
        in_specs.append(pl.BlockSpec((1, bn),
                                     lambda i, g, idx_: (0, idx_[i, g]),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    in_specs.append(pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                                 memory_space=pltpu.VMEM))
    operands.append(mask_neg)

    out_w = 2 * Dv + 128 + (Ws if lr else 0)
    scratch = [
        pltpu.VMEM((bm, 2 * Dv), jnp.float32),
        pltpu.VMEM((bm, 1), jnp.float32),
        pltpu.VMEM((bm, 1), jnp.float32),
    ]
    if lr:
        scratch.append(pltpu.VMEM((bm, Ws), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_w), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_hier_parts_kernel, sem_d, has_scale, lr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * (bn * (cat_d + 2 * Dv)
                                + gpt_s * (cat_d + Ws)
                                + gpt_g * (cat_d + Wg)),
            bytes_accessed=nB * K * (bn + gpt_s + gpt_g) * (cat_d + Dv) * 2
            + Bp * (cat_d + Dv) * 4,
            transcendentals=Bp * K * (2 * bn + gpt_s + gpt_g),
        ),
        interpret=interpret,
    )(idx, *operands)
    return out


# ---------------------------------------------------------------------------
# the public entry points


def _home_tile(m_s: jnp.ndarray, t_real: int) -> jnp.ndarray:
    """Per-query hottest REAL tile from scan stats [Bp, t_pad].  Pad tiles'
    zero centroids score logit 0 in the scan, which would win the argmax for
    queries whose real-tile logits are all negative and hand them a phantom
    pad-tile 'home' (degrading query-sort coherence) — mask them out."""
    t_pad = m_s.shape[1]
    real = jnp.arange(t_pad) < t_real
    return jnp.argmax(jnp.where(real[None, :], m_s, -jnp.inf), axis=1)


def _pad_queries(q_sem, q_xyz, hb: HierBank, bm: int):
    B = q_sem.shape[0]
    Bp = _round_up(B, bm)
    q_s = jnp.pad(q_sem.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    q_x = (jnp.pad(q_xyz.astype(jnp.float32), ((0, Bp - B), (0, 0)))
           if q_xyz is not None else None)
    return q_s, q_x


def _hybrid_order(q_xyz, home_s, n_valid: int, t_pad: int,
                  sort: str = "hybrid"):
    """Query ordering so bm-query tiles are coherent and share candidate
    tiles.  'geo': latitude band then longitude (the geo family's candidate
    tiles are literally the nearby bank tiles; the sem argmax is usually
    ALSO local on autocorrelated banks).  'hybrid': coarse geographic cell
    first, then each cell's queries grouped by their hottest sem tile from
    the scan stats (compresses the sem long tail's scatter union at the
    cost of slightly coarser geo coherence).  No locations -> home-sem-tile
    grouping.  Padded query rows sort last."""
    Bp = home_s.shape[0]
    if q_xyz is None:
        key = home_s
    else:
        lat = jnp.arcsin(jnp.clip(q_xyz[:, 2], -1, 1))
        lon = jnp.arctan2(q_xyz[:, 1], q_xyz[:, 0])
        if sort == "geo":
            nb = 12
            band = jnp.clip(((lat / jnp.pi + 0.5) * nb).astype(jnp.int32),
                            0, nb - 1)
            key = band * 4096 + jnp.clip(
                ((lon / (2 * jnp.pi) + 0.5) * 4096).astype(jnp.int32), 0, 4095)
        else:
            nb, nl = 8, 6
            band = jnp.clip(((lat / jnp.pi + 0.5) * nb).astype(jnp.int32),
                            0, nb - 1)
            cell = band * nl + jnp.clip(
                ((lon / (2 * jnp.pi) + 0.5) * nl).astype(jnp.int32), 0, nl - 1)
            key = cell * (t_pad + 1) + home_s
    key = jnp.where(jnp.arange(Bp) < n_valid, key, jnp.iinfo(jnp.int32).max)
    return jnp.argsort(key, stable=True)


def _hier_partials(q_cat: jnp.ndarray, hb: HierBank, *, k_tiles: int,
                   bm: int, tc: int, j_sem: int, j_geo: int, mode: str,
                   n_valid: int, k_geo: int = 0,
                   scan_bm: Optional[int] = None,
                   raw: bool = False,
                   adaptive_frac: float = 0.0, adaptive_mult: int = 3,
                   m_corr: int = 0, dedup: int = 0,
                   k_union: Optional[int] = None,
                   interpret: bool = False):
    """The hier pipeline body on (already sorted) packed queries:
    fused scan (stats + all-tiles tail) -> tile selection -> parts kernel
    (exact − group approx over selected tiles) -> combined UNNORMALIZED
    partials (acc_s, acc_g, d_s, d_g), each [Bp, ...] f32.

    Partials are linear, so bank shards combine with a plain psum
    (parallel/sharded.sharded_retrieve_hier) exactly like the dense parts
    kernel's.

    Banks built with `lr_rank` run the LOW-RANK sem tail: the scan and the
    parts approximation both accumulate rank-r coefficients, their
    difference unprojects ONCE through u_sem outside the kernels (all
    linear), cutting the scan's value matmul from Dvp to rp columns."""
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    use_lr = hb.g_sem_vw_lr is not None and hb.lr_rank > 0
    sem_vw = hb.g_sem_vw_lr if use_lr else hb.g_sem_vw
    # low-rank GEO tail rides the family-split path only (the merged parts
    # kernel has no geo-lr combine); elsewhere the full-width operand runs
    use_lrg = (hb.g_geo_vw_lr is not None and hb.lr_geo > 0
               and bool(k_geo) and mode == "range+")
    geo_vw = hb.g_geo_vw_lr if use_lrg else hb.g_geo_vw
    # weighted-supergroup sem tail (round 4, build_hier_bank(tail_super=)):
    # the scan contracts the narrow supergroup operand and a cheap
    # group-granularity correction kernel restores the exact fine tail on
    # the selected K + m_corr tiles (see _hier_corr_kernel)
    use_ts = bool(hb.tail_super) and hb.g_sem_ts_vw is not None
    if use_ts and not (k_geo and mode == "range+"):
        raise ValueError(
            "tail_super banks serve via the family-split path only: pass "
            "k_geo > 0 with mode='range+' (the merged parts kernel has no "
            "supergroup-tail correction)")
    scan_sem_vw = hb.g_sem_ts_vw if use_ts else sem_vw
    sup_r = hb.tail_super // hb.gsz_sem if use_ts else 0
    # rank-k selection+tail sketch (round 5, build_hier_bank(sel_lr=)):
    # the scan's sem group logits AND the parts kernels' group-approx
    # logits both contract the k-dim sketch instead of sem_d — identical
    # sketched logits on both sides keep the exact-minus-approx telescope
    # exact on selected tiles; only the UNSELECTED tail mass and the
    # selection ranking see the sketch.  Queries project once ([Bp, k],
    # ~free); the sketch rides APPENDED to q_cat for the parts kernels
    # (their first sem_d columns must stay exact for the row logits) and
    # REPLACES the sem slice for the scan.
    use_sel = bool(hb.sel_lr) and hb.g_sem_sel is not None
    if use_sel and not (k_geo and mode == "range+"):
        raise ValueError(
            "sel_lr banks serve via the family-split path only: pass "
            "k_geo > 0 with mode='range+' (the merged parts kernel has no "
            "sketched-group slice)")
    if use_sel:
        # project in f32, then round to the packed dtype (bf16 on the fast
        # tier): Mosaic rejects mixed-dtype matmuls, and a concat with f32
        # columns would silently upcast the whole operand
        q_sel = jnp.dot(q_cat[:, :hb.sem_d].astype(jnp.float32), hb.p_sel.T,
                        preferred_element_type=jnp.float32
                        ).astype(q_cat.dtype)
        q_scan = jnp.concatenate([q_sel, q_cat[:, hb.sem_d:]], axis=1)
        q_sem_parts = jnp.concatenate([q_cat, q_sel], axis=1)
        scan_sem_cat = hb.g_sem_sel
        sem_gcat = hb.g_sem_sel
    else:
        q_scan = q_sem_parts = q_cat
        scan_sem_cat = hb.g_sem_cat
        sem_gcat = hb.g_sem_cat
    # the scan emits PER-QUERY stats/tails, so its query-block size is a
    # pure perf knob, independent of the bm that defines selection tiles —
    # a larger scan block streams the group operands Bp/scan_bm times
    # instead of Bp/bm times (bandwidth), at more VMEM per step
    sb = scan_bm or bm
    if q_cat.shape[0] % sb:
        sb = bm
    m_s, s_s, m_g, s_g, tails = _hier_scan_call(
        q_scan, scan_sem_cat, hb.g_geo_cat, scan_sem_vw, geo_vw,
        bm=sb, tc=tc, gpt_s=gpt_s, gpt_g=gpt_g,
        has_geo=mode == "range+", sup_r_s=sup_r, interpret=interpret)
    Dv = hb.value_dim
    Ws = sem_vw.shape[1]
    if k_geo and mode == "range+":
        # asymmetric exact budgets: the sem family's K (the probe-fidelity
        # knob) rides a sem-only parts kernel — no geo value matmul on
        # those tiles — while the sharply-local geo family gets its own
        # small exact list.  ~2x less parts work at equal K_sem.
        if use_ts:
            # ONE mass-ranked selection of K + m_corr tiles (top_k returns
            # score-descending columns): the first K get exact parts
            # treatment, ALL K + m_corr get the fine-tail correction — the
            # K exact tiles MUST be corrected or the parts kernel's fine
            # subtraction would not telescope against the supergroup tail
            idx_sm, sel_s = select_tiles(
                m_s, s_s, m_g, s_g, t_real=hb.t_real,
                k_tiles=k_tiles + m_corr, bm=bm, n_valid=n_valid,
                j_sem=j_sem, j_geo=j_geo, mode="range")
            idx_s = idx_sm[:, :min(k_tiles, idx_sm.shape[1])]
        else:
            idx_s, sel_s = select_tiles(
                m_s, s_s, m_g, s_g, t_real=hb.t_real,
                k_tiles=k_tiles, bm=bm, n_valid=n_valid,
                j_sem=j_sem, j_geo=j_geo, mode="range")
        idx_g, sel_g = select_tiles(m_g, s_g, m_s, s_s, t_real=hb.t_real,
                                    k_tiles=k_geo, bm=bm, n_valid=n_valid,
                                    j_sem=j_geo, j_geo=j_sem, mode="range")
        use_rr = bool(hb.res_rank) and hb.z_sem is not None
        # round-5 tile dedup: merge f adjacent blocks' lists into one union
        # dispatch (selection granularity/fidelity untouched — every block
        # keeps its own K tiles; the parts kernels do strictly MORE exact
        # tiles per query at k_union/(f*K) of the dispatch work)
        idx_ps, idx_pg, bm_p = idx_s, idx_g, bm
        if dedup > 1 and not use_ts and q_cat.shape[0] % (dedup * bm) == 0:
            ku_s = min(k_union or (k_tiles + (dedup - 1) * k_tiles // 2),
                       dedup * idx_s.shape[1])
            ku_g = min(max(1, ku_s * max(k_geo, 1) // max(k_tiles, 1)),
                       dedup * max(idx_g.shape[1], 1))
            idx_ps = _dedup_union(idx_s, dedup, ku_s)
            idx_pg = _dedup_union(idx_g, dedup, ku_g)
            bm_p = bm * dedup
        parts_s = _hier_parts_family_call(
            q_sem_parts, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg,
            idx_ps, sem_gcat, sem_vw, hb.z_sem, sem_d=hb.sem_d, bm=bm_p,
            bn=hb.bn, gpt=gpt_s, geo=False, lr=use_lr, rr=int(use_rr),
            lrr=hb.lr_rank, dedup_pad=bm_p != bm, sel=use_sel,
            interpret=interpret)
        parts_g = _hier_parts_family_call(
            q_cat, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg, idx_pg,
            hb.g_geo_cat, geo_vw, hb.z_geo, sem_d=hb.sem_d, bm=bm_p,
            bn=hb.bn, gpt=gpt_g, geo=True, lr=use_lrg, rr=int(use_rr),
            lrr=hb.lr_geo, dedup_pad=bm_p != bm, interpret=interpret)
        corr_ts = (_hier_corr_call(q_cat, idx_sm, hb.g_sem_cat,
                                   hb.g_sem_ts_dvw, bm=bm, gpt=gpt_s,
                                   interpret=interpret)
                   if use_ts else None)
        # mass-bound-adaptive rescue (round 4): feature relerr concentrates
        # in queries whose SELECTED tiles carry a small fraction of their
        # total exp-mass (the tail approximation then dominates the blend).
        # The scan stats already bound that un-selected mass per query, so
        # the worst `adaptive_frac` of queries get a `adaptive_mult`x wider
        # re-selection and a second pass through the PARTS kernels only —
        # scan stats and tails are selection-independent, so no re-scan —
        # and their per-query partial rows are substituted before the
        # combine (covers the fused and the XLA combine identically).
        bm_r = 128  # rescue blocks are small: gathered queries span sphere
        Bp = q_cat.shape[0]
        R = int(adaptive_frac * Bp) // bm_r * bm_r
        if R and R < Bp:
            def _cov(s, selm):
                tot = jnp.maximum(jnp.sum(s, axis=1), 1e-30)
                selq = jnp.einsum(
                    "bqt,bt->bq", s.reshape(Bp // bm, bm, -1), selm,
                    preferred_element_type=jnp.float32).reshape(Bp)
                return selq / tot
            c = _cov(s_s, sel_s)
            if mode == "range+":
                c = jnp.minimum(c, _cov(s_g, sel_g))
            c = jnp.where(jnp.arange(Bp) < n_valid, c, jnp.inf)
            # ascending re-sort keeps the rescue blocks in the original
            # geographic order (coherent selection unions)
            worst = jnp.sort(jax.lax.top_k(-c, R)[1].astype(jnp.int32))
            q_r = q_cat[worst]
            k2 = min(adaptive_mult * k_tiles, hb.t_real)
            kg2 = min(adaptive_mult * k_geo, hb.t_real)
            idx_s2, _ = select_tiles(
                m_s[worst], s_s[worst], m_g[worst], s_g[worst],
                t_real=hb.t_real,
                k_tiles=k2 + (adaptive_mult * m_corr if use_ts else 0),
                bm=bm_r, n_valid=R,
                j_sem=j_sem + 4, j_geo=j_geo, mode="range")
            if use_ts:
                # the rescued queries' wider exact list needs its OWN
                # fine-tail correction cover (telescope consistency)
                corr2 = _hier_corr_call(q_r, idx_s2, hb.g_sem_cat,
                                        hb.g_sem_ts_dvw, bm=bm_r,
                                        gpt=gpt_s, interpret=interpret)
                corr_ts = corr_ts.at[worst].set(corr2)
                idx_s2 = idx_s2[:, :min(k2, idx_s2.shape[1])]
            idx_g2, _ = select_tiles(
                m_g[worst], s_g[worst], m_s[worst], s_s[worst],
                t_real=hb.t_real, k_tiles=kg2, bm=bm_r, n_valid=R,
                j_sem=j_geo + 4, j_geo=j_sem, mode="range")
            ps2 = _hier_parts_family_call(
                q_sem_parts[worst], hb.k_cat, hb.values, hb.value_scale,
                hb.mask_neg, idx_s2, sem_gcat, sem_vw, hb.z_sem,
                sem_d=hb.sem_d, bm=bm_r, bn=hb.bn, gpt=gpt_s, geo=False,
                lr=use_lr, rr=int(use_rr), lrr=hb.lr_rank, sel=use_sel,
                interpret=interpret)
            pg2 = _hier_parts_family_call(
                q_r, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg,
                idx_g2, hb.g_geo_cat, geo_vw, hb.z_geo, sem_d=hb.sem_d,
                bm=bm_r, bn=hb.bn, gpt=gpt_g, geo=True, lr=use_lrg,
                rr=int(use_rr), lrr=hb.lr_geo, interpret=interpret)
            parts_s = parts_s.at[worst].set(ps2)
            parts_g = parts_g.at[worst].set(pg2)
        if use_ts:
            # tails now carry the EXACT fine-group sem tail on every
            # corrected tile (supergroup everywhere else); the count column
            # was exact all along (dvw's count column is 0)
            tails = tails.at[:, :Ws].add(corr_ts)
        if raw:
            # pre-combine pieces for the fused combine+concat kernel
            # (retrieve_hier gates this on the lr+rr family-split shape)
            assert use_lr and use_rr
            return parts_s, parts_g, tails
        if use_lr and use_rr:
            r, rrp = hb.lr_rank, hb.z_sem.shape[1]
            corr = tails[:, :Ws] - parts_s[:, rrp + 128:]
            acc_s = jnp.dot(parts_s[:, :rrp], hb.w_sem,
                            preferred_element_type=jnp.float32) + jnp.dot(
                corr[:, :r], hb.u_sem, preferred_element_type=jnp.float32)
            d_s = parts_s[:, rrp:rrp + 1] + corr[:, r:r + 1]
        elif use_lr:
            r = hb.lr_rank
            corr = tails[:, :Ws] - parts_s[:, Dv + 128:]
            acc_s = parts_s[:, :Dv] + jnp.dot(
                corr[:, :r], hb.u_sem, preferred_element_type=jnp.float32)
            d_s = parts_s[:, Dv:Dv + 1] + corr[:, r:r + 1]
        elif use_rr:
            acc_s = (parts_s[:, :Dv] + tails[:, :Dv] + jnp.dot(
                parts_s[:, Dv + 128:], hb.w_sem,
                preferred_element_type=jnp.float32))
            d_s = parts_s[:, Dv:Dv + 1] + tails[:, Dv:Dv + 1]
        else:
            acc_s = parts_s[:, :Dv] + tails[:, :Dv]
            d_s = parts_s[:, Dv:Dv + 1] + tails[:, Dv:Dv + 1]
        if use_lrg and use_rr:
            rg, rrp_g = hb.lr_geo, hb.z_geo.shape[1]
            Wg = geo_vw.shape[1]
            corr_g = tails[:, Ws:Ws + Wg] - parts_g[:, rrp_g + 128:]
            acc_g = jnp.dot(parts_g[:, :rrp_g], hb.w_geo,
                            preferred_element_type=jnp.float32) + jnp.dot(
                corr_g[:, :rg], hb.u_geo, preferred_element_type=jnp.float32)
            d_g = parts_g[:, rrp_g:rrp_g + 1] + corr_g[:, rg:rg + 1]
        elif use_lrg:
            rg = hb.lr_geo
            Wg = geo_vw.shape[1]
            corr_g = tails[:, Ws:Ws + Wg] - parts_g[:, Dv + 128:]
            acc_g = parts_g[:, :Dv] + jnp.dot(
                corr_g[:, :rg], hb.u_geo, preferred_element_type=jnp.float32)
            d_g = parts_g[:, Dv:Dv + 1] + corr_g[:, rg:rg + 1]
        else:
            acc_g = parts_g[:, :Dv] + tails[:, Ws:Ws + Dv]
            if use_rr:
                acc_g = acc_g + jnp.dot(parts_g[:, Dv + 128:], hb.w_geo,
                                        preferred_element_type=jnp.float32)
            d_g = parts_g[:, Dv:Dv + 1] + tails[:, Ws + Dv:Ws + Dv + 1]
        return acc_s, acc_g, d_s, d_g
    idx, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                            k_tiles=k_tiles, bm=bm, n_valid=n_valid,
                            j_sem=j_sem, j_geo=j_geo, mode=mode)
    # parts = sum over selected tiles of (exact - group approximation)
    parts = _hier_parts_call(q_cat, hb.k_cat, hb.values, hb.value_scale,
                             hb.mask_neg, idx, hb.g_sem_cat, hb.g_geo_cat,
                             sem_vw, hb.g_geo_vw, sem_d=hb.sem_d, bm=bm,
                             bn=hb.bn, gpt_s=gpt_s, gpt_g=gpt_g, lr=use_lr,
                             interpret=interpret)
    if use_lr:
        r = hb.lr_rank
        corr = tails[:, :Ws] - parts[:, 2 * Dv + 128:]
        acc_s = parts[:, :Dv] + jnp.dot(
            corr[:, :r], hb.u_sem, preferred_element_type=jnp.float32)
        d_s = parts[:, 2 * Dv:2 * Dv + 1] + corr[:, r:r + 1]
    else:
        acc_s = parts[:, :Dv] + tails[:, :Dv]
        d_s = parts[:, 2 * Dv:2 * Dv + 1] + tails[:, Dv:Dv + 1]
    acc_g = parts[:, Dv:2 * Dv]
    d_g = parts[:, 2 * Dv + 1:2 * Dv + 2]
    if mode == "range+":
        acc_g = acc_g + tails[:, Ws:Ws + Dv]
        d_g = d_g + tails[:, Ws + Dv:Ws + Dv + 1]
    return acc_s, acc_g, d_s, d_g


def _gather_cols(stats: jnp.ndarray, idx: jnp.ndarray, bm: int
                 ) -> jnp.ndarray:
    """stats [Bp, t_pad], idx [nB, M] -> [Bp, M]: each query's stat at its
    query tile's selected columns."""
    Bp = stats.shape[0]
    rows = jnp.arange(Bp) // bm
    return stats[jnp.arange(Bp)[:, None], idx[rows]]


def _hier_partials2(q_cat: jnp.ndarray, hb: HierBank, *, k_tiles: int,
                    m_tiles: int, bm: int, tc: int, j_sem: int, j_geo: int,
                    mode: str, n_valid: int, interpret: bool = False):
    """Two-level pipeline body (requires build_hier_bank(gsz_super=...)):

      phase 1  coarse fused scan — SUPERGROUP granularity sem tail (+ geo
               tail) + coarse per-tile stats, ~gsz_super/gsz_sem times less
               scan work than the one-level scan;
      phase 2  refine kernel over the top-M coarse tiles: fine stats (the
               K-selection signal at one-level fidelity) + the
               fine-minus-super tail correction;
      phase 3  K ⊆ M exact tiles selected on the FINE stats (+ coarse geo
               stats gathered at the M columns); the unchanged parts kernel
               computes exact-minus-fine there.

    total = coarse_tail + sum_M (fine - super) + sum_K (exact - fine) —
    the same telescope as one-level, one level deeper."""
    assert hb.gsz_super and hb.g_sup_cat is not None, \
        "two-level pipeline needs build_hier_bank(gsz_super=...)"
    gpt_sup = hb.bn // hb.gsz_super
    gpt_f = hb.bn // hb.gsz_sem
    gpt_g = hb.bn // hb.gsz_geo
    m_tiles = min(m_tiles, hb.t_real)
    k_tiles = min(k_tiles, m_tiles)
    m_s, s_s, m_g, s_g, tails = _hier_scan_call(
        q_cat, hb.g_sup_cat, hb.g_geo_cat, hb.g_sup_vw, hb.g_geo_vw,
        bm=bm, tc=tc, gpt_s=gpt_sup, gpt_g=gpt_g,
        has_geo=mode == "range+", interpret=interpret)
    idx_m, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                            k_tiles=m_tiles, bm=bm, n_valid=n_valid,
                            j_sem=j_sem, j_geo=j_geo, mode=mode)
    m_f, s_f, rparts = _hier_refine_call(
        q_cat, idx_m, hb.g_sem_cat, hb.g_sup_cat, hb.g_sem_vw, hb.g_sup_vw,
        bm=bm, gpt_f=gpt_f, gpt_sup=gpt_sup, interpret=interpret)
    mg_at = _gather_cols(m_g, idx_m, bm)
    sg_at = _gather_cols(s_g, idx_m, bm)
    idx_loc, _ = select_tiles(m_f, s_f, mg_at, sg_at, t_real=m_tiles,
                              k_tiles=k_tiles, bm=bm, n_valid=n_valid,
                              j_sem=j_sem, j_geo=j_geo, mode=mode)
    idx_k = jnp.take_along_axis(idx_m, idx_loc, axis=1)
    parts = _hier_parts_call(q_cat, hb.k_cat, hb.values, hb.value_scale,
                             hb.mask_neg, idx_k, hb.g_sem_cat, hb.g_geo_cat,
                             hb.g_sem_vw, hb.g_geo_vw, sem_d=hb.sem_d, bm=bm,
                             bn=hb.bn, gpt_s=gpt_f, gpt_g=gpt_g,
                             interpret=interpret)
    Dv = hb.value_dim
    Dvp = hb.g_sem_vw.shape[1]
    acc_s = parts[:, :Dv] + rparts[:, :Dv] + tails[:, :Dv]
    d_s = (parts[:, 2 * Dv:2 * Dv + 1] + rparts[:, Dv:Dv + 1]
           + tails[:, Dv:Dv + 1])
    acc_g = parts[:, Dv:2 * Dv]
    d_g = parts[:, 2 * Dv + 1:2 * Dv + 2]
    if mode == "range+":
        acc_g = acc_g + tails[:, Dvp:Dvp + Dv]
        d_g = d_g + tails[:, Dvp + Dv:Dvp + Dv + 1]
    return acc_s, acc_g, d_s, d_g


# ---------------------------------------------------------------------------
# fused combine+concat epilogue: lr/rr unprojection matmuls + softmax
# normalization + beta blend + query concat in ONE pass over the partials


def _combine_cat_kernel(Ws, r, rrp, Dv, beta, rg, Wg, ps_ref, pg_ref,
                        tails_ref, q_ref, wsem_ref, wgeo_ref, out_ref):
    """One [bm]-query block of the flagship combine (round-4 glue fusion).

    The XLA combine (the `use_lr and use_rr` branch of `_hier_partials`)
    plus the API layer's `concat([retrieved, q])` round-trips ~5 full-width
    [Bp, Dv] f32 buffers through HBM (measured 1.18 ms standalone at
    B=10,240, tools/r4_glue.py).  Here the two small unprojection matmuls
    run on the MXU with the normalize/blend/concat fused as their epilogue,
    reading each partial once and writing the FINAL [Bp, Dv+Dq] output."""
    ps = ps_ref[:]
    tails = tails_ref[:]
    # corr = all-tiles lr tail - selected tiles' lr approximation
    corr = tails[:, :Ws] - ps[:, rrp + 128:]
    # sem accumulator: [rr coefficients | corr lr coefficients] through the
    # stacked [w_sem; u_sem] basis — ONE matmul (rrp is 128-aligned, so the
    # lane concat is layout-clean)
    coef = jnp.concatenate([ps[:, :rrp], corr[:, :r]], axis=1)
    acc_s = jnp.dot(coef, wsem_ref[:], preferred_element_type=jnp.float32)
    d_s = ps[:, rrp:rrp + 1] + corr[:, r:r + 1]
    pg = pg_ref[:]
    if rg:
        # geo-lr: same one-matmul pattern through the stacked
        # [w_geo; u_geo] basis
        corr_g = tails[:, Ws:Ws + Wg] - pg[:, rrp + 128:]
        coef_g = jnp.concatenate([pg[:, :rrp], corr_g[:, :rg]], axis=1)
        acc_g = jnp.dot(coef_g, wgeo_ref[:],
                        preferred_element_type=jnp.float32)
        d_g = pg[:, rrp:rrp + 1] + corr_g[:, rg:rg + 1]
    else:
        acc_g = (pg[:, :Dv] + tails[:, Ws:Ws + Dv]
                 + jnp.dot(pg[:, Dv + 128:], wgeo_ref[:],
                           preferred_element_type=jnp.float32))
        d_g = pg[:, Dv:Dv + 1] + tails[:, Ws + Dv:Ws + Dv + 1]
    sem = acc_s / jnp.maximum(d_s, 1e-30)
    geo = acc_g / jnp.maximum(d_g, 1e-30)
    out_ref[:, :Dv] = beta * sem + (1.0 - beta) * geo
    out_ref[:, Dv:] = q_ref[:]


@functools.partial(jax.jit, static_argnames=("Ws", "r", "rrp", "Dv", "beta",
                                             "rg", "Wg", "bm", "interpret"))
def _combine_cat_call(ps, pg, tails, q_srt, w_sem, u_sem, w_geo, u_geo=None,
                      *, Ws: int, r: int, rrp: int, Dv: int, beta: float,
                      bm: int, rg: int = 0, Wg: int = 0,
                      interpret: bool = False) -> jnp.ndarray:
    Bp = ps.shape[0]
    Dq = q_srt.shape[1]
    wsem = jnp.concatenate([w_sem, u_sem], axis=0)  # [rrp + r, Dv]
    wgeo = jnp.concatenate([w_geo, u_geo], axis=0) if rg else w_geo
    return pl.pallas_call(
        functools.partial(_combine_cat_kernel, Ws, r, rrp, Dv, beta, rg, Wg),
        grid=(Bp // bm,),
        in_specs=[
            pl.BlockSpec((bm, ps.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, pg.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, tails.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, Dq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rrp + r, Dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rrp + rg, Dv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, Dv + Dq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Dv + Dq), jnp.float32),
        interpret=interpret,
    )(ps, pg, tails, q_srt, wsem, wgeo)


@functools.partial(jax.jit, static_argnames=(
    "sem_temp", "geo_temp", "beta", "mode", "k_tiles", "m_tiles", "k_geo",
    "bm", "tc", "j_sem", "j_geo", "scan_bm", "sort_queries", "sort",
    "adaptive_frac", "adaptive_mult", "m_corr", "dedup", "k_union",
    "interpret"))
def retrieve_hier(q_sem: jnp.ndarray, q_xyz: Optional[jnp.ndarray],
                  hb: HierBank, *, sem_temp: float = 12.0,
                  geo_temp: float = 40.0, beta: float = 0.5,
                  mode: str = "range+", k_tiles: int = 16,
                  m_tiles: Optional[int] = None, k_geo: int = 0,
                  bm: int = 256,
                  tc: int = 16, j_sem: int = 2, j_geo: int = 2,
                  scan_bm: Optional[int] = None,
                  sort_queries: bool = True, sort: str = "geo",
                  concat_query: Optional[jnp.ndarray] = None,
                  adaptive_frac: float = 0.0, adaptive_mult: int = 3,
                  m_corr: int = 0, dedup: int = 0,
                  k_union: Optional[int] = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Two-stage retrieval over a prepared HierBank (see module docstring).

    Drop-in approximate counterpart of `ops.retrieval.retrieve` /
    `retrieve_pallas`: same [B, Dv] output semantics at
    ~(K*bn + N/gsz_sem)/N of the dense exact work.  Fidelity knobs:
    `k_tiles` + `j_sem`/`j_geo` (exact coverage — the recall knobs),
    `hb.gsz_sem` (tail granularity — the feature-error knob), `bm`
    (query-tile coherence).

    `adaptive_frac > 0` enables the mass-bound-adaptive rescue (round 4):
    the `adaptive_frac` fraction of queries with the lowest selected-mass
    coverage (from the scan's exp-mass stats) re-run the parts kernels with
    an `adaptive_mult`x wider selection — capping the p99 feature-error
    tail for ~frac*mult extra parts work.  Family-split shapes only
    (k_geo > 0, the flagship layout).

    Banks built with `tail_super` run the weighted-supergroup sem tail:
    the scan's sem tail matmul contracts ratio = tail_super/gsz_sem fewer
    rows, and the selected k_tiles + `m_corr` tiles get the exact
    fine-group tail back through the cheap correction kernel (`m_corr`
    extra corrected-but-not-exact tiles cost ~gpt/bn of an exact tile
    each).  Family-split shapes only, like the rescue.

    Fidelity depends on the SPATIAL COHERENCE of each bm-query tile: the
    K selected tiles are shared by bm geographically-sorted queries, so a
    small global batch under a large bm spans too much sphere per tile and
    selection coverage collapses (measured: B=10240/bm=256 -> 0.98 tile
    coverage; B=2048/bm=256 -> 0.25).  Shrink bm toward 128 (the minimum —
    transposed scan blocks need 128 query lanes) for batches under ~10k;
    the API layer (models/range_encoder.py) does this automatically."""
    if mode == "range":
        beta = 1.0
        q_xyz = None
    if tc > 16:
        import logging

        logging.getLogger("range_tpu").warning(
            "retrieve_hier: tc=%d — tc>16 has measured Mosaic MISCOMPILES "
            "(silently corrupt scan stats/tail, worst maxrel 0.26 vs tc=16 "
            "on v5e; PERF.md round 3b).  Verify outputs against tc=16 "
            "before trusting this configuration.", tc)
    B = q_sem.shape[0]
    # dedup merges f adjacent bm-blocks per parts dispatch — pad the batch
    # to whole superblocks so the merged grid tiles evenly
    q_s, q_x = _pad_queries(q_sem, q_xyz, hb, bm * max(dedup, 1))
    q_cat = pack_queries(q_s, q_x, sem_temp, geo_temp, tier=hb.tier)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo

    inv = None
    order = None
    hybrid = sort == "hybrid" or q_x is None
    if sort_queries and not hybrid:
        # geographic ordering depends only on the query locations — sort
        # BEFORE the scan so the scan's stats and tail come out already in
        # sorted order (the alternative permutes ~45 MB of per-query stats
        # + tail rows per 10k batch)
        order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                              hb.t_pad, sort=sort)
        inv = jnp.argsort(order)
        q_cat = q_cat[order]

    # low-rank banks run the one-level lr pipeline; two-level only when
    # super operands exist and lr does not (v1+lr beat v2 on probe
    # fidelity: the diffuse sem mass needs the FINE tail on all tiles)
    use_lr = hb.g_sem_vw_lr is not None and hb.lr_rank > 0
    use2 = bool(hb.gsz_super) and hb.g_sup_cat is not None and not use_lr
    if hb.res_rank and hb.z_sem is not None and not k_geo:
        # residual-rank parts live in the family-split kernels only —
        # give the geo family its own exact budget when the caller didn't
        k_geo = max(8, k_tiles // 2)
    if sort_queries and hybrid:
        # hybrid ordering groups each coarse geo cell's queries by their
        # hottest sem tile, which needs the scan stats — run a stats-only
        # scan first (coarse operands when the bank is two-level: the home
        # signal only drives the sort), then permute and recompute fused
        if use2:
            m_s0, _, _, _ = _hier_scan_stats_call(
                q_cat, hb.g_sup_cat, hb.g_geo_cat, bm=bm, tc=tc,
                gpt_s=hb.bn // hb.gsz_super, gpt_g=gpt_g,
                interpret=interpret)
        else:
            m_s0, _, _, _ = _hier_scan_stats_call(
                q_cat, hb.g_sem_cat, hb.g_geo_cat, bm=bm, tc=tc, gpt_s=gpt_s,
                gpt_g=gpt_g, interpret=interpret)
        home = _home_tile(m_s0, hb.t_real)
        order = _hybrid_order(q_x, home, B, hb.t_pad, sort=sort)
        inv = jnp.argsort(order)
        q_cat = q_cat[order]
    # fused combine+concat epilogue (round-4 glue fusion): the flagship
    # shape (family-split lr+rr partials, 128-aligned widths) computes the
    # unprojection matmuls + normalize + blend + query concat in one Pallas
    # pass, writing the FINAL [B, Dv+Dq] output — the XLA combine plus the
    # API-layer concat cost ~1.2 ms/10k queries of pure HBM traffic
    # (tools/r4_glue.py)
    use_rr = bool(hb.res_rank) and hb.z_sem is not None
    use_lrg = hb.g_geo_vw_lr is not None and hb.lr_geo > 0
    fused_cat = (concat_query is not None and not use2
                 and mode == "range+" and use_lr and use_rr and k_geo > 0
                 and hb.value_dim % 128 == 0 and hb.lr_rank % 128 == 0
                 and (not use_lrg or hb.lr_geo % 128 == 0)
                 and concat_query.shape[1] % 128 == 0)
    if fused_cat:
        ps, pg, tails = _hier_partials(
            q_cat, hb, k_tiles=k_tiles, bm=bm, tc=tc, j_sem=j_sem,
            j_geo=j_geo, mode=mode, n_valid=B, k_geo=k_geo,
            scan_bm=scan_bm, raw=True, adaptive_frac=adaptive_frac,
            adaptive_mult=adaptive_mult, m_corr=m_corr, dedup=dedup,
            k_union=k_union, interpret=interpret)
        q_pad = jnp.pad(concat_query.astype(jnp.float32),
                        ((0, q_cat.shape[0] - B), (0, 0)))
        q_srt = q_pad[order] if order is not None else q_pad
        out = _combine_cat_call(
            ps, pg, tails, q_srt, hb.w_sem, hb.u_sem, hb.w_geo,
            hb.u_geo if use_lrg else None,
            Ws=hb.g_sem_vw_lr.shape[1], r=hb.lr_rank, rrp=hb.z_sem.shape[1],
            Dv=hb.value_dim, beta=beta, bm=bm,
            rg=hb.lr_geo if use_lrg else 0,
            Wg=hb.g_geo_vw_lr.shape[1] if use_lrg else 0,
            interpret=interpret)
        return out[inv[:B]] if inv is not None else out[:B]
    if use2:
        acc_s, acc_g, d_s, d_g = _hier_partials2(
            q_cat, hb, k_tiles=k_tiles,
            m_tiles=m_tiles or max(32, 3 * k_tiles), bm=bm, tc=tc,
            j_sem=j_sem, j_geo=j_geo, mode=mode, n_valid=B,
            interpret=interpret)
    else:
        acc_s, acc_g, d_s, d_g = _hier_partials(
            q_cat, hb, k_tiles=k_tiles, bm=bm, tc=tc, j_sem=j_sem,
            j_geo=j_geo, mode=mode, n_valid=B, k_geo=k_geo,
            scan_bm=scan_bm, adaptive_frac=adaptive_frac,
            adaptive_mult=adaptive_mult, m_corr=m_corr, dedup=dedup,
            k_union=k_union, interpret=interpret)
    sem = acc_s / jnp.maximum(d_s, 1e-30)
    if mode == "range":
        out = sem
    else:
        geo = acc_g / jnp.maximum(d_g, 1e-30)
        out = beta * sem + (1.0 - beta) * geo
    # un-sort: inv[:B] holds each original query's sorted position (padded
    # rows sort last, so these all point at valid rows)
    out = out[inv[:B]] if inv is not None else out[:B]
    if concat_query is not None:
        # non-fused shapes still honor the concat contract ([B, Dv+Dq])
        out = jnp.concatenate([out, concat_query.astype(jnp.float32)],
                              axis=1)
    return out


def hier_nn(q_sem: jnp.ndarray, q_xyz: Optional[jnp.ndarray], hb: HierBank,
            *, sem_temp: float = 12.0, geo_temp: float = 40.0,
            k_tiles: int = 16, bm: int = 256, tc: int = 16, j_sem: int = 2,
            j_geo: int = 2, sort: str = "geo",
            mode: str = "range+") -> jnp.ndarray:
    """Fidelity harness: the semantic argmax row the hier path can see —
    serving-tier packed logits restricted to the SELECTED tiles (rows in
    dropped tiles can never win).  recall@1 of this against exact_nn on
    `hb.bank` measures the served path's retrieval fidelity.  Harness-only
    (materializes [B, N] masked logits); not a serving code path."""
    B = q_sem.shape[0]
    if mode == "range":
        q_xyz = None
    q_s, q_x = _pad_queries(q_sem, q_xyz, hb, bm)
    q_cat = pack_queries(q_s, q_x, sem_temp, geo_temp, tier=hb.tier)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    m_s, s_s, m_g, s_g, _ = _hier_scan_call(
        q_cat, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw, hb.g_geo_vw,
        bm=bm, tc=tc, gpt_s=gpt_s, gpt_g=gpt_g,
        interpret=jax.default_backend() == "cpu")
    home = (_home_tile(m_s, hb.t_real) if (sort == "hybrid" or q_x is None)
            else jnp.zeros(m_s.shape[0], jnp.int32))
    order = _hybrid_order(q_x, home, B, hb.t_pad, sort=sort)
    inv = jnp.argsort(order)
    q_cat = q_cat[order]
    m_s, s_s = m_s[order], s_s[order]
    m_g, s_g = m_g[order], s_g[order]
    _, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                          k_tiles=k_tiles, bm=bm, n_valid=B, j_sem=j_sem,
                          j_geo=j_geo,
                          mode="range+" if q_x is not None else "range")

    # chunked masked argmax (the [B, N] logits would not fit at serving B)
    @jax.jit
    def score_chunk(qc, keep):
        logits = jnp.dot(qc, hb.k_cat[:, :hb.sem_d].T,
                         preferred_element_type=jnp.float32)
        row_keep = keep * (hb.mask_neg[0][None, :] >= 0)
        return jnp.argmax(jnp.where(row_keep > 0, logits, -jnp.inf),
                          axis=1).astype(jnp.int32)

    row_keep_t = jnp.repeat(sel[:, :hb.t_real], hb.bn, axis=1)  # [nB, N]
    bests = []
    cs = 1024
    for lo in range(0, B, cs):
        hi = min(lo + cs, B)
        bests.append(score_chunk(
            q_cat[lo:hi, :hb.sem_d],
            row_keep_t[jnp.arange(lo, hi) // bm]))
    best = jnp.concatenate(bests)
    return best[inv[:B]]


# ---------------------------------------------------------------------------
# HierBank disk cache: bank prep costs minutes (k-means + packing over a slow
# device link); serving restarts load the prepacked operands in seconds.


def bank_fingerprint(bank: GeoBank) -> str:
    """Cheap content fingerprint of a source bank: shape/validity meta plus
    a hash of the first key rows (enough to tell two different banks apart
    without pulling the whole array off-device)."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.asarray(bank.keys_sem[:2]).astype(np.float32).tobytes())
    h.update(np.asarray(bank.locs_lonlat[:2]).astype(np.float32).tobytes())
    for n in (bank.num_rows, int(bank.n_valid), bank.value_dim,
              bank.key_dim):
        h.update(str(n).encode())
    return h.hexdigest()[:16]


def hier_build_signature(bank: GeoBank, *, bn: int, gsz_sem: int,
                         gsz_geo: int, tier: str, seed: int,
                         shards: int, gsz_super: int = 0,
                         group_by: str = "key_value",
                         group_value_weight: float = 1.0,
                         lr_rank: int = 0, lr_geo: int = 0,
                         res_rank: int = 0,
                         topk_gsz: int = 0, topk_lr: int = 0,
                         tail_super: int = 0, sel_lr: int = 0) -> dict:
    """The identity of a `build_hier_bank` run: source bank + every build
    parameter.  Stored in the disk cache and validated on load so a stale
    cache (different bank or params) is rebuilt, never silently served."""
    # fmt bumps when the serialized operand LAYOUT changes (fmt 2: slim
    # family-sliced group centroids) so older caches rebuild
    if lr_rank:
        # mirror build_hier_bank's clamp so the signature records the
        # EFFECTIVE rank (caches built before the clamp also miss)
        lr_rank = min(lr_rank, int(bank.values.shape[1]))
    if lr_geo:
        lr_geo = min(lr_geo, int(bank.values.shape[1]))
    if res_rank:
        res_rank = min(res_rank, int(bank.values.shape[1]))
    if sel_lr:
        sel_lr = min(sel_lr, int(bank.keys_sem.shape[1]))
    sig = {"fp": bank_fingerprint(bank), "bn": bn, "gsz_sem": gsz_sem,
           "gsz_geo": gsz_geo, "gsz_super": gsz_super, "tier": tier,
           "seed": seed, "shards": shards, "group_by": group_by,
           "gvw": group_value_weight, "lr_rank": lr_rank,
           "res_rank": res_rank, "topk_gsz": topk_gsz, "fmt": 2}
    if topk_lr:
        # keyed only when active so pre-round-5 caches stay signature-valid
        sig["topk_lr"] = topk_lr
    if lr_geo:
        # keyed only when active so pre-round-4 caches stay signature-valid
        sig["lr_geo"] = lr_geo
    if tail_super:
        sig["tail_super"] = tail_super
    if sel_lr:
        # keyed only when active so pre-round-5 caches stay signature-valid
        sig["sel_lr"] = sel_lr
    return sig


def peek_hier_build(path: str) -> Optional[dict]:
    """Read just the build signature from a `save_hier_bank` archive
    (None for pre-signature archives)."""
    import json

    with np.load(path) as z:  # lazy: only the meta member is decompressed
        meta = json.loads(z["meta_json"].tobytes().decode())
    return meta.get("build")


def save_hier_bank(hb: HierBank, path: str, build: Optional[dict] = None
                   ) -> None:
    """Serialize a prepared HierBank to one npz (arrays + meta).

    bf16 arrays are stored as uint16 bit patterns (npz has no bf16).
    `build` (from `hier_build_signature`) records what the archive was built
    from so loaders can detect staleness."""
    import json

    def enc(x):
        x = np.asarray(x)
        if x.dtype == jnp.bfloat16:
            return x.view(np.uint16), "bf16"
        return x, str(x.dtype)

    arrays, meta = {}, {"dtypes": {}}
    for field in ("k_cat", "values", "value_scale", "mask_neg",
                  "sem_centroid", "geo_centroid", "sem_radius", "geo_radius",
                  "g_sem_cat", "g_geo_cat", "g_sem_vw", "g_geo_vw",
                  "khl_sem", "g_sup_cat", "g_sup_vw", "g_sem_vw_lr",
                  "u_sem", "g_geo_vw_lr", "u_geo",
                  "z_sem", "w_sem", "z_geo", "w_geo",
                  "g_sem_ts_vw", "g_sem_ts_dvw",
                  "g_topk_cat", "g_topk_lr", "p_topk",
                  "g_sem_sel", "p_sel"):
        v = getattr(hb, field)
        if v is None:
            continue
        arrays[field], meta["dtypes"][field] = enc(v)
    for field in ("locs_lonlat", "xyz", "keys_sem", "valid_mask"):
        v = getattr(hb.bank, field)
        if v is None:
            continue
        arrays["bank_" + field], meta["dtypes"]["bank_" + field] = enc(v)
    arrays["bank_values"], meta["dtypes"]["bank_values"] = enc(hb.bank.values)
    if hb.bank.value_scale is not None:
        arrays["bank_value_scale"], meta["dtypes"]["bank_value_scale"] = enc(
            hb.bank.value_scale)
    arrays["bank_n_valid"] = np.asarray(hb.bank.n_valid)
    for field in ("tier", "bn", "gsz_sem", "gsz_geo", "gsz_super",
                  "lr_rank", "lr_geo", "res_rank", "topk_gsz", "topk_lr",
                  "tail_super", "sel_lr", "sem_d", "cat_d", "t_real",
                  "t_pad"):
        meta[field] = getattr(hb, field)
    if build is not None:
        meta["build"] = build
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_hier_bank(path: str) -> HierBank:
    """Load a `save_hier_bank` archive back onto the default device."""
    import json

    raw = dict(np.load(path))
    meta = json.loads(raw.pop("meta_json").tobytes().decode())

    def dec(name):
        if name not in raw:
            return None
        x = raw[name]
        if meta["dtypes"].get(name) == "bf16":
            return jnp.asarray(x.view(np.uint16), jnp.uint16).view(jnp.bfloat16)
        return jnp.asarray(x)

    bank = GeoBank(
        locs_lonlat=dec("bank_locs_lonlat"),
        xyz=dec("bank_xyz"),
        keys_sem=dec("bank_keys_sem"),
        values=dec("bank_values"),
        n_valid=jnp.asarray(raw["bank_n_valid"]),
        valid_mask=dec("bank_valid_mask"),
        value_scale=dec("bank_value_scale"),
    )
    return HierBank(
        bank=bank,
        k_cat=dec("k_cat"), values=dec("values"),
        value_scale=dec("value_scale"), mask_neg=dec("mask_neg"),
        sem_centroid=dec("sem_centroid"), geo_centroid=dec("geo_centroid"),
        sem_radius=dec("sem_radius"), geo_radius=dec("geo_radius"),
        g_sem_cat=dec("g_sem_cat"), g_geo_cat=dec("g_geo_cat"),
        g_sem_vw=dec("g_sem_vw"), g_geo_vw=dec("g_geo_vw"),
        khl_sem=dec("khl_sem"),
        g_sup_cat=dec("g_sup_cat"), g_sup_vw=dec("g_sup_vw"),
        g_sem_vw_lr=dec("g_sem_vw_lr"), u_sem=dec("u_sem"),
        g_geo_vw_lr=dec("g_geo_vw_lr"), u_geo=dec("u_geo"),
        z_sem=dec("z_sem"), w_sem=dec("w_sem"),
        z_geo=dec("z_geo"), w_geo=dec("w_geo"),
        g_sem_ts_vw=dec("g_sem_ts_vw"), g_sem_ts_dvw=dec("g_sem_ts_dvw"),
        g_topk_cat=dec("g_topk_cat"),
        g_topk_lr=dec("g_topk_lr"), p_topk=dec("p_topk"),
        g_sem_sel=dec("g_sem_sel"), p_sel=dec("p_sel"),
        tier=meta["tier"], bn=meta["bn"], gsz_sem=meta["gsz_sem"],
        gsz_geo=meta["gsz_geo"], gsz_super=meta.get("gsz_super", 0),
        lr_rank=meta.get("lr_rank", 0),
        lr_geo=meta.get("lr_geo", 0),
        res_rank=meta.get("res_rank", 0),
        topk_gsz=meta.get("topk_gsz", 0),
        topk_lr=meta.get("topk_lr", 0),
        tail_super=meta.get("tail_super", 0),
        sel_lr=meta.get("sel_lr", 0),
        sem_d=meta["sem_d"], cat_d=meta["cat_d"],
        t_real=meta["t_real"], t_pad=meta["t_pad"],
    )

def prepare_hier_bank(bank: GeoBank, *, bn: int = 512, gsz_sem: int = 8,
                      gsz_geo: int = 64, gsz_super: int = 0,
                      tier: str = "fast", group_by: str = "key_value",
                      group_value_weight: float = 1.0,
                      lr_rank: Optional[int] = None,
                      lr_geo: Optional[int] = None,
                      res_rank: Optional[int] = None,
                      topk_gsz: int = 0, topk_lr: int = 0,
                      tail_super: int = 0, sel_lr: int = 0,
                      seed: int = 0, shards: int = 1,
                      cache_path: Optional[str] = None,
                      force: bool = False,
                      host_stage: Optional[bool] = None) -> HierBank:
    """Build a serving-ready HierBank, or load it from a signature-validated
    disk cache.

    The single entry point shared by `api.load_model(retrieval='hier',
    hier_cache=...)` and the offline CLI (`python -m range_tpu.build_hier`)
    so both sides compute the IDENTICAL build signature — a CLI-prepared
    cache is guaranteed to hit at serving time.  A cache whose stored
    signature doesn't match this request (different source bank or any
    build param) is rebuilt, never silently served."""
    import logging
    import os

    sig = hier_build_signature(bank, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
                               gsz_super=gsz_super, tier=tier, seed=seed,
                               shards=shards, group_by=group_by,
                               group_value_weight=group_value_weight,
                               lr_rank=lr_rank or 0, lr_geo=lr_geo or 0,
                               res_rank=res_rank or 0,
                               topk_gsz=topk_gsz, topk_lr=topk_lr,
                               tail_super=tail_super, sel_lr=sel_lr)
    if cache_path and os.path.exists(cache_path) and not force:
        got = peek_hier_build(cache_path)
        if got == sig:
            return load_hier_bank(cache_path)
        logging.getLogger("range_tpu").warning(
            "hier cache %s is stale (built %s, requested %s) — rebuilding",
            cache_path, got, sig)
    hb = build_hier_bank(bank, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
                         gsz_super=gsz_super, group_by=group_by,
                         group_value_weight=group_value_weight,
                         lr_rank=lr_rank, lr_geo=lr_geo, res_rank=res_rank,
                         topk_gsz=topk_gsz, topk_lr=topk_lr,
                         tail_super=tail_super, sel_lr=sel_lr,
                         tier=tier, seed=seed,
                         shards=shards, host_stage=host_stage)
    if cache_path:
        save_hier_bank(hb, cache_path, build=sig)
    return hb
