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
    g of rows with similar KEYS,  sum_{r in g} e^{l_r} v_r ~= e^{l_{c_g}} VS_g
    with error second-order in the group's key spread.  Grouping rows by
    k-means in KEY space (not geography) minimizes exactly that spread;
    running the key-k-means WITHIN each geographic tile keeps groups
    tile-aligned, so the per-query-tile selection mask applies to groups.

Pipeline (semantics preserved from `range/range.py:209-240`):
  offline  `build_hier_bank`: geographic k-means reorder (bank/clustered.py)
           so kernel tiles are spatially coherent; then key-space k-means
           WITHIN each bn-row tile reorders rows so each gsz-row window is a
           key-coherent group; prepack serving operands; per-TILE bounding
           balls (selection) and per-GROUP centroids / mean values / counts
           (tail), at independent granularity per family (fine for the
           diffuse sem family, coarse for the local geo family).
  online   1. sort the query batch geographically (bm-query tiles become
              spatially coherent so a shared per-tile candidate list works);
           2. coarse-score tiles, take top-K per query-tile by upper-bound
              mass deficit across BOTH families (a query's true-argmax tile
              always has deficit >= 0, so recall survives selection);
           3. Pallas kernel: EXACT dual-softmax over the K selected tiles
              (grid walks a scalar-prefetched tile list), emitting
              unnormalized partials (bounded logits - plain sums);
           4. tail: group-centroid contributions of all NON-selected tiles,
              two [B,G]x[G,.] XLA matmuls per family;
           5. combine partials + tail, normalize, blend, restore order.

Work per query: K*bn exact rows + N/gsz tail groups, vs N dense.  Fidelity
is MEASURED, not assumed: bench.py reports recall@1 of this path against
HIGHEST-precision exact NN (target >= 0.999) and feature error vs the exact
dense path; `k_tiles` trades throughput vs recall, `gsz_sem` tail cost vs
feature error.
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


@dataclasses.dataclass
class HierBank:
    """Clustered + prepacked serving bank for `retrieve_hier`.

    Data (jnp arrays; N = padded rows, T = N/bn tiles, G* = N/gsz_* groups):
      bank:        the clustered GeoBank (row-reordered, scattered validity)
      k_cat:       [N, cat_d]  packed serving keys (pack_bank, `tier`)
      values:      [N, Dv]     serving values (bf16, or int8 with scale)
      value_scale: [1, N] f32  int8 dequant scales or None
      mask_neg:    [1, N] f32  additive row-validity mask (0 / -1e30)
      sem_centroid/geo_centroid/sem_radius/geo_radius: tile bounding balls
        ([T, Dk], [T, 3], [T], [T] f32) — selection operands
      g_sem / g_geo:            [G*_pad, Dk|3] bf16 group centroids
      g_sem_vmean / g_geo_vmean: [G*_pad, Dv] bf16 group mean values
      g_sem_count / g_geo_count: [1, G*_pad] f32 group valid-row counts
    Meta (static): tier, bn, gsz_sem, gsz_geo, sem_d, cat_d.
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
    g_sem: jnp.ndarray
    g_sem_vmean: jnp.ndarray
    g_sem_count: jnp.ndarray
    g_geo: jnp.ndarray
    g_geo_vmean: jnp.ndarray
    g_geo_count: jnp.ndarray
    tier: str = "fast"
    bn: int = 512
    gsz_sem: int = 8
    gsz_geo: int = 64
    sem_d: int = 256
    cat_d: int = 384

    @property
    def n_tiles(self) -> int:
        return self.sem_radius.shape[0]

    @property
    def value_dim(self) -> int:
        return self.values.shape[1]


jax.tree_util.register_dataclass(
    HierBank,
    data_fields=["bank", "k_cat", "values", "value_scale", "mask_neg",
                 "sem_centroid", "geo_centroid", "sem_radius", "geo_radius",
                 "g_sem", "g_sem_vmean", "g_sem_count",
                 "g_geo", "g_geo_vmean", "g_geo_count"],
    meta_fields=["tier", "bn", "gsz_sem", "gsz_geo", "sem_d", "cat_d"],
)


def _order_rows_within_tiles(keys: jnp.ndarray, valid: jnp.ndarray, bn: int,
                             n_groups: int, seed: int) -> np.ndarray:
    """Permutation [N] that reorders rows WITHIN each bn-row tile so rows
    with similar keys are consecutive: per-tile k-means in key space
    (vmapped Lloyd on device), rows sorted by cluster label, invalid rows
    last.  Tile membership is untouched, so tile stats/masks stay valid."""
    from .kmeans import kmeans

    N = keys.shape[0]
    T = N // bn
    ks = keys.astype(jnp.float32).reshape(T, bn, -1)
    vs = valid.reshape(T, bn)
    tile_keys = jax.random.split(jax.random.PRNGKey(seed), T)
    _, assign = jax.vmap(
        lambda k, p, v: kmeans(k, p, n_groups, iters=6, valid=v)
    )(tile_keys, ks, vs)  # [T, bn]
    assign = np.asarray(assign)
    vn = np.asarray(vs)
    # sort key: cluster label, invalid rows pushed past every label
    sort_key = assign + (1.0 - vn) * (n_groups + 1)
    order = np.argsort(sort_key, axis=1, kind="stable")  # [T, bn]
    return (order + (np.arange(T) * bn)[:, None]).reshape(-1)


def build_hier_bank(bank: GeoBank, *, bn: int = 512, gsz_sem: int = 8,
                    gsz_geo: int = 64, tier: str = "fast",
                    n_clusters: Optional[int] = None, iters: int = 8,
                    seed: int = 0, value_dtype=None) -> HierBank:
    """Offline serving prep: cluster + reorder the bank, prepack operands.

    Bank prep is offline (like building the npz itself): geographic k-means
    reorder (bank/clustered.py), within-tile key-space k-means reorder, then
    packed/derived operands computed on device in one jit.
    """
    from ..bank.clustered import cluster_bank, tile_stats

    assert bn % gsz_sem == 0 and bn % gsz_geo == 0, (bn, gsz_sem, gsz_geo)
    cbank, _ = cluster_bank(bank, bn=bn, n_clusters=n_clusters, iters=iters,
                            seed=seed)
    # reorder rows within each tile so gsz_sem-row windows are key-coherent
    perm = _order_rows_within_tiles(cbank.keys_sem, cbank.row_mask(), bn,
                                    bn // gsz_sem, seed + 1)

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
    stats = tile_stats(cbank, bn)
    N = cbank.num_rows
    sem_d, cat_d = packed_dims(cbank.key_dim, tier)

    def group_stats(feats, vals_f32, mask, gsz):
        G = N // gsz
        G_pad = _round_up(G, 128)
        mg = mask.reshape(G, gsz)
        cnt = mg.sum(axis=1)  # [G]
        w = mg / jnp.maximum(cnt, 1.0)[:, None]
        cg = jnp.einsum("gi,gid->gd", w,
                        feats.astype(jnp.float32).reshape(G, gsz, -1))
        vmean = jnp.einsum("gi,gid->gd", w, vals_f32.reshape(G, gsz, -1))

        def padg(x, dtype):
            return jnp.pad(x, ((0, G_pad - G), (0, 0))).astype(dtype)

        return (padg(cg, jnp.bfloat16), padg(vmean, jnp.bfloat16),
                jnp.pad(cnt, (0, G_pad - G))[None, :].astype(jnp.float32))

    @jax.jit
    def prep(cbank):
        k_cat = pack_bank(cbank.keys_sem, cbank.xyz, tier=tier)
        mask = cbank.row_mask()
        mask_neg = (NEG * (1.0 - mask))[None, :].astype(jnp.float32)
        vals_f32 = dequantize_values(cbank) * mask[:, None]
        g_s = group_stats(cbank.keys_sem, vals_f32, mask, gsz_sem)
        g_g = group_stats(cbank.xyz, vals_f32, mask, gsz_geo)
        return k_cat, mask_neg, g_s, g_g

    k_cat, mask_neg, (g_sem, g_sem_vmean, g_sem_count), \
        (g_geo, g_geo_vmean, g_geo_count) = prep(cbank)
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
        g_sem=g_sem, g_sem_vmean=g_sem_vmean, g_sem_count=g_sem_count,
        g_geo=g_geo, g_geo_vmean=g_geo_vmean, g_geo_count=g_geo_count,
        tier=tier, bn=bn, gsz_sem=gsz_sem, gsz_geo=gsz_geo,
        sem_d=sem_d, cat_d=cat_d,
    )


def _group_logits(q, cents):
    """[Bp, G_pad] raw (untempered) centroid similarities, bf16 MXU pass."""
    return jnp.dot(q.astype(jnp.bfloat16), cents.T,
                   preferred_element_type=jnp.float32)


def select_tiles_grouped(e_s: jnp.ndarray, e_g: Optional[jnp.ndarray],
                         hb: HierBank, *, k_tiles: int, bm: int, n_valid: int,
                         j_sem: int = 2, j_geo: int = 2, mode: str = "range+"
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group-evidence tile selection.

    Tile-centroid bounds cannot rank reliably (a 256-d key ball's radius
    slack dwarfs the logit spread) — but the GROUP exp-logits computed for
    the tail are an 8-64-row-granularity scan of the whole bank.  Two
    signals per family, both from `e_* = exp2(temp*log2e*L)` [Bp, G_pad]:

      1. per-query top-`j` groups -> their OWNING tiles, unioned over the
         bm queries of a query tile (the per-query argmax guarantee;
         measured 0.996+ argmax-tile hit at j_sem=2-3 vs <=0.66 for every
         bound-based rule);
      2. estimated tile mass: per-query max-normalized exp-logits summed
         over (queries in the tile, groups in the tile) — ranks the
         cap/fill so the least-mass tiles are dropped first (a plain
         deficit rank ties at 0 for every home tile and drops arbitrarily).

    Returns (idx [nB, K] int32 — distinct; sel [nB, T] f32)."""
    Bp = e_s.shape[0]
    nB = Bp // bm
    T = hb.n_tiles
    k_tiles = min(k_tiles, T)
    row_valid = jnp.arange(Bp) < n_valid

    def scatter_family(sel, e, gpt, j):
        _, gidx = jax.lax.top_k(e, j)  # [Bp, j] group ids
        tiles = (gidx // gpt).astype(jnp.int32)
        # invalid (padded) query rows scatter into the dumped extra column T
        tiles = jnp.where(row_valid[:, None], tiles, T)
        rows = jnp.broadcast_to((jnp.arange(Bp) // bm)[:, None], tiles.shape)
        return sel.at[rows, tiles].set(1.0)

    def tile_mass(e, gpt):
        p_n = e / jnp.max(e, axis=1, keepdims=True)  # [Bp, G_pad], <= 1
        p_n = jnp.where(row_valid[:, None], p_n, 0.0)
        return p_n[:, :T * gpt].reshape(nB, bm, T, gpt).sum(axis=(1, 3))

    sel = jnp.zeros((nB, T + 1), jnp.float32)
    sel = scatter_family(sel, e_s, hb.bn // hb.gsz_sem, j_sem)
    pri_tile = tile_mass(e_s, hb.bn // hb.gsz_sem)
    if mode == "range+" and e_g is not None:
        sel = scatter_family(sel, e_g, hb.bn // hb.gsz_geo, j_geo)
        pri_tile = pri_tile + tile_mass(e_g, hb.bn // hb.gsz_geo)
    sel = sel[:, :T]

    big = 1e9
    _, idx = jax.lax.top_k(sel * big + pri_tile, k_tiles)
    idx = idx.astype(jnp.int32)
    sel = jnp.zeros((nB, T), jnp.float32)
    sel = sel.at[jnp.arange(nB)[:, None], idx].set(1.0)
    return idx, sel


def _hier_parts_kernel(sem_d, has_scale, idx_ref, q_ref, k_ref, v_ref, *rest):
    """Exact dual-softmax partials over each query-tile's selected bank
    tiles.  Grid (iB, K); the bank-side block index maps follow the
    scalar-prefetched idx list.  Emits UNNORMALIZED [bm, 2*Dv + 128]
    partials ([sem_acc | geo_acc | d_sem | d_geo | pad]) — bounded logits
    make plain sums safe (see retrieval_pallas.py), so the group tail adds
    linearly outside the kernel."""
    if has_scale:
        s_ref, mask_ref, out_ref, acc_ref, ds_ref, dg_ref = rest
    else:
        mask_ref, out_ref, acc_ref, ds_ref, dg_ref = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

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

    @pl.when(j == nj - 1)
    def _():
        Dv2 = 2 * Dv
        out_ref[:, :Dv2] = acc_ref[:]
        out_ref[:, Dv2:Dv2 + 1] = ds_ref[:]
        out_ref[:, Dv2 + 1:Dv2 + 2] = dg_ref[:]
        out_ref[:, Dv2 + 2:] = jnp.zeros_like(out_ref[:, Dv2 + 2:])


@functools.partial(jax.jit, static_argnames=("sem_d", "bm", "bn", "interpret"))
def _hier_parts_call(q_cat, k_cat, values, scale, mask_neg, idx, *,
                     sem_d: int, bm: int, bn: int,
                     interpret: bool = False) -> jnp.ndarray:
    B, cat_d = q_cat.shape
    N, Dv = values.shape
    Bp = _round_up(B, bm)
    if Bp != B:
        q_cat = jnp.pad(q_cat, ((0, Bp - B), (0, 0)))
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
    ]
    operands = [q_cat, k_cat, values]
    has_scale = scale is not None
    if has_scale:
        in_specs.append(pl.BlockSpec((1, bn),
                                     lambda i, g, idx_: (0, idx_[i, g]),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    in_specs.append(pl.BlockSpec((1, bn), lambda i, g, idx_: (0, idx_[i, g]),
                                 memory_space=pltpu.VMEM))
    operands.append(mask_neg)

    out_w = 2 * Dv + 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, out_w), lambda i, g, idx_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, 2 * Dv), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hier_parts_kernel, sem_d, has_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * K * bn * (cat_d + 2 * Dv),
            bytes_accessed=nB * K * bn * (cat_d + Dv) * 2
            + Bp * (cat_d + Dv) * 4,
            transcendentals=2 * Bp * K * bn,
        ),
        interpret=interpret,
    )(idx, *operands)
    return out[:B]


def hier_nn(q_sem: jnp.ndarray, q_xyz: Optional[jnp.ndarray], hb: HierBank,
            *, sem_temp: float = 12.0, geo_temp: float = 40.0,
            k_tiles: int = 24, bm: int = 256, j_sem: int = 2, j_geo: int = 2,
            mode: str = "range+") -> jnp.ndarray:
    """Fidelity harness: the semantic argmax row the hier path can see —
    serving-tier packed logits restricted to the SELECTED tiles (rows in
    dropped tiles can never win).  recall@1 of this against exact_nn on
    `hb.bank` measures the served path's retrieval fidelity.  Harness-only
    (materializes [B, N] masked logits); not a serving code path."""
    B = q_sem.shape[0]
    if mode == "range":
        q_xyz = None
    from ..geometry import geo_sort_order

    if q_xyz is not None:
        order = geo_sort_order(q_xyz)
        inv = jnp.argsort(order)
        q_sem_s = q_sem[order]
        q_xyz_s = q_xyz[order]
    else:
        inv = None
        q_sem_s, q_xyz_s = q_sem, None
    Bp = _round_up(B, bm)
    q_s = jnp.pad(q_sem_s.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    q_x = (jnp.pad(q_xyz_s.astype(jnp.float32), ((0, Bp - B), (0, 0)))
           if q_xyz_s is not None else None)
    e_s = jnp.exp2(jnp.minimum(sem_temp * LOG2E * _group_logits(q_s, hb.g_sem),
                               CLAMP2))
    e_g = (jnp.exp2(jnp.minimum(geo_temp * LOG2E * _group_logits(q_x, hb.g_geo),
                                CLAMP2))
           if q_x is not None else None)
    _, sel = select_tiles_grouped(e_s, e_g, hb, k_tiles=k_tiles, bm=bm,
                                  n_valid=B, j_sem=j_sem, j_geo=j_geo,
                                  mode="range+" if q_x is not None else "range")
    q_cat = pack_queries(q_sem_s, q_xyz_s, sem_temp, geo_temp, tier=hb.tier)
    logits = jnp.dot(q_cat[:, :hb.sem_d], hb.k_cat[:, :hb.sem_d].T,
                     preferred_element_type=jnp.float32)
    row_keep = jnp.repeat(sel, hb.bn, axis=1)  # [nB, N]
    row_keep = row_keep[jnp.arange(B) // bm] * (hb.mask_neg[0][None, :] >= 0)
    best = jnp.argmax(jnp.where(row_keep > 0, logits, -jnp.inf),
                      axis=1).astype(jnp.int32)
    if inv is not None:
        best = best[inv]
    return best


def _family_tail(e, vmean, count, sel, *, bm: int,
                 gpt: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group-centroid contributions of all rows in NON-selected tiles for
    one family, from the precomputed group exp-logits `e` [Bp, G_pad] (the
    same array selection ranked): one [Bp, G] x [G, Dv] XLA matmul — full
    MXU rate, no [B, N] anything.  `gpt` = groups per tile (expands the
    tile-level selection mask to groups).  Returns (acc [Bp, Dv],
    d [Bp, 1]) f32 in the kernel's unnormalized units (exp2 of
    log2e-folded logits)."""
    Bp, G_pad = e.shape
    nB = Bp // bm
    T = sel.shape[1]
    keep_t = 1.0 - sel  # [nB, T]
    keep_g = jnp.repeat(keep_t, gpt, axis=1)  # [nB, T*gpt]
    keep_g = jnp.pad(keep_g, ((0, 0), (0, G_pad - T * gpt)))
    keep_g = keep_g * count  # fold counts; padded groups have count 0

    p = (e.reshape(nB, bm, G_pad) * keep_g[:, None, :]).reshape(Bp, G_pad)
    d = jnp.sum(p, axis=1, keepdims=True)
    acc = jnp.dot(p.astype(jnp.bfloat16), vmean,
                  preferred_element_type=jnp.float32)
    return acc, d


@functools.partial(jax.jit, static_argnames=(
    "sem_temp", "geo_temp", "beta", "mode", "k_tiles", "bm", "j_sem",
    "j_geo", "sort_queries", "tail", "interpret"))
def retrieve_hier(q_sem: jnp.ndarray, q_xyz: Optional[jnp.ndarray],
                  hb: HierBank, *, sem_temp: float = 12.0,
                  geo_temp: float = 40.0, beta: float = 0.5,
                  mode: str = "range+", k_tiles: int = 24, bm: int = 256,
                  j_sem: int = 2, j_geo: int = 2, sort_queries: bool = True,
                  tail: bool = True, interpret: bool = False) -> jnp.ndarray:
    """Two-stage retrieval over a prepared HierBank (see module docstring).

    Drop-in approximate counterpart of `ops.retrieval.retrieve` /
    `retrieve_pallas`: same [B, Dv] output semantics at
    ~(K*bn + N/gsz_sem)/N of the dense exact work.  Fidelity knobs:
    `k_tiles` + `j_sem`/`j_geo` (exact coverage — the recall knobs),
    `hb.gsz_sem` (tail granularity — the feature-error knob), `bm`
    (query-tile coherence); `tail=False` drops the correction (pure
    pruning; only sound when BOTH families are local)."""
    if mode == "range":
        beta = 1.0
        q_xyz = None
    B = q_sem.shape[0]
    inv = None
    if sort_queries:
        if q_xyz is not None:
            from ..geometry import geo_sort_order

            order = geo_sort_order(q_xyz)
        else:
            # mode='range' has no locations: group queries by their nearest
            # sem tile centroid so query tiles share candidate tiles
            home = jnp.argmax(q_sem.astype(jnp.float32) @ hb.sem_centroid.T,
                              axis=1)
            order = jnp.argsort(home, stable=True)
        inv = jnp.argsort(order)
        q_sem = q_sem[order]
        if q_xyz is not None:
            q_xyz = q_xyz[order]
    Bp = _round_up(B, bm)
    q_s = jnp.pad(q_sem.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    q_x = (jnp.pad(q_xyz.astype(jnp.float32), ((0, Bp - B), (0, 0)))
           if q_xyz is not None else None)

    # ONE group-granularity scan of the bank per family: the exp'd logits
    # rank the selection AND price the tail
    e_s = jnp.exp2(jnp.minimum(sem_temp * LOG2E * _group_logits(q_s, hb.g_sem),
                               CLAMP2))
    e_g = (jnp.exp2(jnp.minimum(geo_temp * LOG2E * _group_logits(q_x, hb.g_geo),
                                CLAMP2))
           if mode == "range+" else None)
    idx, sel = select_tiles_grouped(e_s, e_g, hb, k_tiles=k_tiles, bm=bm,
                                    n_valid=B, j_sem=j_sem, j_geo=j_geo,
                                    mode=mode)
    q_cat = pack_queries(q_sem, q_xyz, sem_temp, geo_temp, tier=hb.tier)
    parts = _hier_parts_call(q_cat, hb.k_cat, hb.values, hb.value_scale,
                             hb.mask_neg, idx, sem_d=hb.sem_d, bm=bm,
                             bn=hb.bn, interpret=interpret)
    Dv = hb.value_dim
    acc_s = parts[:, :Dv]
    acc_g = parts[:, Dv:2 * Dv]
    d_s = parts[:, 2 * Dv:2 * Dv + 1]
    d_g = parts[:, 2 * Dv + 1:2 * Dv + 2]
    if tail:
        t_acc, t_d = _family_tail(e_s, hb.g_sem_vmean, hb.g_sem_count, sel,
                                  bm=bm, gpt=hb.bn // hb.gsz_sem)
        acc_s = acc_s + t_acc[:B]
        d_s = d_s + t_d[:B]
        if mode == "range+":
            t_acc, t_d = _family_tail(e_g, hb.g_geo_vmean, hb.g_geo_count,
                                      sel, bm=bm, gpt=hb.bn // hb.gsz_geo)
            acc_g = acc_g + t_acc[:B]
            d_g = d_g + t_d[:B]
    sem = acc_s / jnp.maximum(d_s, 1e-30)
    if mode == "range":
        out = sem
    else:
        geo = acc_g / jnp.maximum(d_g, 1e-30)
        out = beta * sem + (1.0 - beta) * geo
    if inv is not None:
        out = out[inv]
    return out
