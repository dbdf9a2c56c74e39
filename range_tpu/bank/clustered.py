"""Clustered bank: spatially-ordered rows + per-tile pruning bounds.

The scaling idea the reference never needed (single-GPU brute force): with
bank rows reordered so each kernel tile is geographically coherent, a tile's
contribution to either softmax is bounded by

    max_{row in tile} t * (q . k_row)  <=  t * (q . c_tile + r_tile)

(Cauchy-Schwarz, c = tile centroid, r = max row distance to c).  Tiles whose
upper bound sits `margin` below a query-tile's best lower bound contribute
< e^{-margin} relative softmax mass and are skipped — exactly, with an
auditable error bound, not heuristically.  The geo family (temp 40) prunes
hard under spatial ordering; the sem family prunes when the key embeddings
are spatially autocorrelated (true for real SatCLIP banks).

`compute_tile_plan` turns the bounds into, per query-tile, a dense-leading
list of active bank-tile indices; the pruned kernel
(ops/retrieval_pallas.py:retrieve_pruned) walks that list via scalar
prefetch — the padded tail repeats the last active tile, which the Pallas
pipeline serves without re-DMA and the kernel skips without compute.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bank import GeoBank
from ..ops.kmeans import kmeans


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TileStats:
    """Per bank tile (bn contiguous rows): bounding balls for both families."""

    sem_centroid: jnp.ndarray  # [T, Dk]
    sem_radius: jnp.ndarray  # [T]
    geo_centroid: jnp.ndarray  # [T, 3]
    geo_radius: jnp.ndarray  # [T]


def geo_pack_order(xyz, valid, bn: int, *, n_clusters: Optional[int] = None,
                   iters: int = 8, seed: int = 0,
                   rows_per_cluster: int = 256,
                   pack: str = "pad") -> np.ndarray:
    """The cluster-contiguous row order cluster_bank applies: geographic
    k-means over `xyz` (device; [N, 3] is small at any bank scale), cluster
    relabeling along latitude bands, greedy bn-aligned packing (host).
    Returns the packed row-index array (-1 = padding), length a multiple of
    bn.  Split out of `cluster_bank` so the host-staged hier build
    (ops/retrieval_hier.py) can compute the order without gathering the
    value matrix on device."""
    assert pack in ("pad", "dense"), pack
    num_rows = xyz.shape[0]
    if n_clusters is None:
        n_clusters = max(8, min(8192, num_rows // rows_per_cluster))
    # Fibonacci-lattice seeding: near-uniform sphere coverage is the ideal
    # init for geographic xyz AND skips k-means++'s n_clusters sequential
    # scan steps (the bottleneck of bank prep at large C — ~12 min -> tens
    # of seconds for a 100k bank over the tunnel)
    from ..data.checkerboard import fibonacci_lattice
    from ..geometry import lonlat_deg_to_xyz

    # the lattice yields 2*(n//2) points — request one extra for odd C
    lons, lats, _ = fibonacci_lattice(n_clusters + (n_clusters % 2))
    seeds = lonlat_deg_to_xyz(jnp.asarray(
        np.stack([lons[:n_clusters], lats[:n_clusters]], 1), jnp.float32))
    centroids, assign = kmeans(jax.random.PRNGKey(seed), jnp.asarray(xyz),
                               n_clusters, iters=iters,
                               valid=jnp.asarray(valid), init_points=seeds)
    # geographic relabeling: latitude bands, longitude within band, so that
    # clusters adjacent in the packing order are spatial neighbors (same
    # ordering the pruned retrieval applies to queries — geometry.geo_sort_order)
    from ..geometry import geo_sort_order

    cluster_order = np.asarray(geo_sort_order(centroids))

    assign_np = np.asarray(assign)
    valid_np = np.asarray(valid) > 0
    # greedy packing of whole clusters into bn-aligned tiles
    chunks = []  # row-index arrays, -1 = padding
    cur = 0  # fill level of the open tile
    for c in cluster_order:
        rows = np.nonzero((assign_np == c) & valid_np)[0]
        if rows.size == 0:
            continue
        if (pack == "pad" and cur > 0 and cur + rows.size > bn
                and rows.size < bn):
            chunks.append(np.full(bn - cur, -1, np.int64))  # pad out the tile
            cur = 0
        chunks.append(rows)
        cur = (cur + rows.size) % bn
    if cur > 0:
        chunks.append(np.full(bn - cur, -1, np.int64))
    order = np.concatenate(chunks) if chunks else np.full(bn, -1, np.int64)
    assert len(order) % bn == 0
    return order


def cluster_bank(bank: GeoBank, bn: int = 1024, n_clusters: Optional[int] = None,
                 iters: int = 8, seed: int = 0,
                 rows_per_cluster: int = 256,
                 pack: str = "pad") -> Tuple[GeoBank, TileStats]:
    """Reorder bank rows cluster-contiguously and pack clusters into
    bn-aligned tiles so that no kernel tile mixes geographically distant
    clusters (mixing blows up the tile bounding radii and kills pruning).

    Host-side (bank prep is offline): geographic k-means, clusters relabeled
    along latitude bands, then greedy packing — whole clusters are appended
    in order.  ``pack``:
      'pad'   — zero-padding inserted whenever the next cluster would
                straddle a tile boundary, so no tile mixes distant clusters
                (best bounding radii; row count grows 10-30%; the pruned
                path's choice).
      'dense' — clusters packed back-to-back with padding only on the final
                tile (a tile may span two ADJACENT clusters — still spatial
                neighbors by the latitude-band relabeling); ~25% less kernel
                work, the hierarchical path's choice.
    The result carries an explicit scattered validity mask.
    """
    assert bank.num_rows % bn == 0, (bank.num_rows, bn)
    order = geo_pack_order(bank.xyz, bank.row_mask(), bn,
                           n_clusters=n_clusters, iters=iters, seed=seed,
                           rows_per_cluster=rows_per_cluster, pack=pack)

    # gather ON DEVICE: pulling the bank to host numpy and back costs a
    # full round-trip of the value matrix over the (slow, tunneled)
    # host<->device link — orders of magnitude slower than a device gather
    sel_np = order >= 0
    safe_idx = jnp.asarray(np.where(sel_np, order, 0).astype(np.int32))
    sel_dev = jnp.asarray(sel_np)

    @jax.jit
    def _gather(x):
        g = jnp.take(x, safe_idx, axis=0)
        return jnp.where(sel_dev.reshape((-1,) + (1,) * (g.ndim - 1)), g,
                         jnp.zeros((), g.dtype))

    def take(x):
        return _gather(x)

    reordered = GeoBank(
        locs_lonlat=take(bank.locs_lonlat),
        xyz=take(bank.xyz),
        keys_sem=take(bank.keys_sem),
        values=take(bank.values),
        n_valid=bank.n_valid,
        valid_mask=jnp.asarray((order >= 0).astype(np.float32)),
        # int8 dequant scales are [1, Np]: reorder along the row axis
        value_scale=(take(bank.value_scale.T).T
                     if bank.value_scale is not None else None),
    )
    stats = tile_stats(reordered, bn)
    return reordered, stats


@functools.partial(jax.jit, static_argnames=("bn",))
def _tile_stats_impl(keys, xyz, valid, bn: int):
    T = keys.shape[0] // bn

    def per_tile(k_t, x_t, v_t):
        w = v_t / jnp.maximum(jnp.sum(v_t), 1.0)
        c_sem = w @ k_t  # [Dk]
        c_geo = w @ x_t
        r_sem = jnp.max(jnp.linalg.norm(k_t - c_sem, axis=1) * v_t)
        r_geo = jnp.max(jnp.linalg.norm(x_t - c_geo, axis=1) * v_t)
        return c_sem, r_sem, c_geo, r_geo

    ks = keys.reshape(T, bn, -1).astype(jnp.float32)
    xs = xyz.reshape(T, bn, 3).astype(jnp.float32)
    vs = valid.reshape(T, bn)
    c_sem, r_sem, c_geo, r_geo = jax.vmap(per_tile)(ks, xs, vs)
    return TileStats(c_sem, r_sem, c_geo, r_geo)


def tile_stats(bank: GeoBank, bn: int) -> TileStats:
    return _tile_stats_impl(bank.keys_sem, bank.xyz, bank.row_mask(), bn=bn)


def compute_keep_mask(q: jnp.ndarray, centroids: jnp.ndarray,
                      radii: jnp.ndarray, *, temp: float, bm: int = 512,
                      margin: float = 20.0) -> jnp.ndarray:
    """[nB, T] bool: per query-tile, which bank tiles can matter for one
    logit family (Cauchy–Schwarz bounding-ball bounds; see module docstring)."""
    B = q.shape[0]
    Bp = ((B + bm - 1) // bm) * bm
    q = jnp.pad(q.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    T = radii.shape[0]
    qc = q @ centroids.T  # [Bp, T]
    ub = temp * (qc + radii[None, :])
    lb = jnp.max(temp * (qc - radii[None, :]), axis=1, keepdims=True)
    keep = ub >= lb - margin  # [Bp, T]
    # padded query rows (all-zero) have ub = temp*r >= lb - margin for every
    # tile, i.e. they would keep EVERYTHING — mask them out of the OR
    row_valid = (jnp.arange(Bp) < B)[:, None]
    keep = keep & row_valid
    return keep.reshape(Bp // bm, bm, T).any(axis=1)  # [nB, T]


def compute_tile_plan(
    q: jnp.ndarray,
    centroids: jnp.ndarray,
    radii: jnp.ndarray,
    *,
    temp: float,
    bm: int = 512,
    margin: float = 20.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per query-tile active bank-tile list for ONE logit family.

    A tile is kept iff for SOME query in the query-tile its upper logit bound
    temp*(q.c + r) exceeds that query's best lower bound max_t temp*(q.c - r)
    minus `margin` (dropped softmax mass < N*e^{-margin} relative; margin 20
    keeps the error under ~1e-4 for N=1e5).

    Returns (idx [nB, T] int32 — active tiles first (ascending), tail
    repeating the last active tile so the kernel pipeline re-serves it
    without DMA; counts [nB] int32)."""
    keep = compute_keep_mask(q, centroids, radii, temp=temp, bm=bm,
                             margin=margin)
    T = radii.shape[0]
    counts = jnp.maximum(jnp.sum(keep, axis=1).astype(jnp.int32), 1)
    # active-first index list: stable argsort of (not keep)
    idx = jnp.argsort(~keep, axis=1, stable=True).astype(jnp.int32)  # [nB, T]
    g = jnp.arange(T)[None, :]
    last = jnp.take_along_axis(idx, jnp.maximum(counts - 1, 0)[:, None], axis=1)
    idx = jnp.where(g < counts[:, None], idx, last)
    return idx, counts
