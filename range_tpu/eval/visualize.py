"""Embedding-space visualization: encode a coordinate grid, project to 3
ICA components, histogram-equalize into an RGB map.

Counterpart of `range/evaluation/visualize_embeddings.py` (which bit-rotted
against the current model API — `model(locs, scale=None)` at :107 no longer
exists upstream).  This version works against any `GeoEncoder`; plotting is
matplotlib-gated (cartopy/basemap aren't required — we return the image).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def coord_grid(extent: Tuple[float, float, float, float] = (-180, 180, -90, 90),
               step: float = 1.0) -> np.ndarray:
    """[H, W, 2] (lon, lat) grid over an extent (visualize_embeddings.py:29-45)."""
    lon_min, lon_max, lat_min, lat_max = extent
    lons = np.arange(lon_min, lon_max, step)
    lats = np.arange(lat_max, lat_min, -step)
    return np.stack(np.meshgrid(lons, lats, indexing="xy"), axis=-1)


def histogram_equalize(x: np.ndarray) -> np.ndarray:
    """Per-channel rank transform to [0, 1] (the reference's equalization
    step before plotting)."""
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty_like(flat)
    n = flat.shape[0]
    for c in range(flat.shape[1]):
        order = np.argsort(flat[:, c])
        ranks = np.empty(n)
        ranks[order] = np.arange(n)
        out[:, c] = ranks / (n - 1)
    return out.reshape(x.shape)


def embedding_rgb_map(encoder, extent=(-180, 180, -90, 90), step: float = 1.0,
                      batch_size: int = 8192, seed: int = 0) -> np.ndarray:
    """[H, W, 3] RGB visualization of an encoder's embedding space."""
    from sklearn.decomposition import FastICA

    grid = coord_grid(extent, step)
    h, w, _ = grid.shape
    coords = grid.reshape(-1, 2)
    embs = []
    for s in range(0, coords.shape[0], batch_size):
        chunk = coords[s:s + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        e = np.asarray(encoder(chunk.astype(np.float32)))
        embs.append(e[: batch_size - pad] if pad else e)
    emb = np.concatenate(embs, 0)
    ica = FastICA(n_components=3, random_state=seed, max_iter=500, tol=1e-3)
    comp = ica.fit_transform(emb)
    rgb = histogram_equalize(comp.reshape(h, w, 3))
    return rgb


def load_coastlines(path: str) -> np.ndarray:
    """Coastline polylines as one [M, 2] (lon, lat) array with NaN-row
    segment separators — the format `overlay_coastlines` draws.

    The reference gets its coastline quality from cartopy/Basemap
    (`visualize_embeddings.py:131-167`, `checkerboarddataset.py:109-173`),
    whose bundled Natural Earth data needs network access this environment
    doesn't have; here the DATA is an input.  Accepted files:
      * .npz/.npy with a `segments` (or sole) [M, 2] float array,
        NaN rows separating segments;
      * GeoJSON (.json/.geojson): LineString / MultiLineString / Polygon /
        MultiPolygon features (e.g. Natural Earth ne_110m_coastline) —
        parsed with the stdlib, no geo stack required."""
    if path.endswith((".npz", ".npy")):
        d = np.load(path)
        if hasattr(d, "files"):
            d = d[d.files[0] if "segments" not in d.files else "segments"]
        return np.asarray(d, np.float64)
    import json

    with open(path) as f:
        gj = json.load(f)
    feats = gj.get("features", [gj])
    segs = []

    def add_lines(geom):
        t, cs = geom["type"], geom["coordinates"]
        if t == "LineString":
            segs.append(np.asarray(cs, np.float64))
        elif t in ("MultiLineString", "Polygon"):
            segs.extend(np.asarray(c, np.float64) for c in cs)
        elif t == "MultiPolygon":
            for poly in cs:
                segs.extend(np.asarray(c, np.float64) for c in poly)
        elif t == "GeometryCollection":
            for g in geom["geometries"]:
                add_lines(g)

    for ft in feats:
        add_lines(ft.get("geometry", ft))
    nan = np.full((1, 2), np.nan)
    return np.concatenate(
        [x for s in segs for x in (s[:, :2], nan)], axis=0)


def overlay_coastlines(ax, coastlines, color="black", lw: float = 0.5
                       ) -> None:
    """Draw NaN-separated (lon, lat) polylines over a map axes (the
    cartopy `ax.coastlines()` analogue for `load_coastlines` data)."""
    c = np.asarray(coastlines, np.float64)
    ax.plot(c[:, 0], c[:, 1], color=color, linewidth=lw)


def save_map(rgb: np.ndarray, path: str, extent=(-180, 180, -90, 90),
             coastlines=None) -> None:
    """Save the RGB map with matplotlib (gated import).  `coastlines`
    optionally overlays `load_coastlines` polylines — the reference's
    cartopy coastline look (visualize_embeddings.py:131-167) with the
    data supplied by the caller."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(rgb, extent=extent, origin="upper")
    if coastlines is not None:
        overlay_coastlines(ax, coastlines)
        ax.set_xlim(extent[0], extent[1])
        ax.set_ylim(extent[2], extent[3])
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_gt_locations(train_locs: np.ndarray, train_classes: np.ndarray,
                      class_of_interest: int, out_path: str,
                      train_dates: np.ndarray = None, mask: np.ndarray = None,
                      extent=(-180, 180, -90, 90)) -> int:
    """Scatter the training locations of one class over an optional earth
    mask, date encoded as color (`csp/main/trainer_helper.py:177-214`).
    Returns the number of instances plotted (matplotlib gated at call time)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    inds = np.where(np.asarray(train_classes) == class_of_interest)[0]
    w = (extent[1] - extent[0]) / 45.0
    h = (extent[3] - extent[2]) / 45.0
    plt.figure(figsize=[w, h])
    if mask is not None:
        plt.imshow(mask, extent=extent, cmap="tab20")
    colors = (np.sin(np.pi * np.asarray(train_dates)[inds])
              if train_dates is not None else None)
    plt.scatter(train_locs[inds, 0], train_locs[inds, 1], c=colors, s=2,
                cmap="magma", vmin=0, vmax=1)
    ax = plt.gca()
    ax.axes.get_xaxis().set_visible(False)
    ax.axes.get_yaxis().set_visible(False)
    ax.set_frame_on(False)
    plt.savefig(out_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close()
    return len(inds)


def save_prediction_map(grid_pred: np.ndarray, path: str) -> None:
    """Render a dense class-probability map the reference's way
    (`csp/main/analysis.py:605-625` plot_prediction): `1 - pred` on the
    afmhot colormap, fixed [0, 1] range, saved as an image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(path, 1.0 - grid_pred, cmap="afmhot", vmin=0, vmax=1)


def save_cluster_map(cluster_map: np.ndarray, path: str,
                     extent=(-180, 180, -90, 90), coastlines=None) -> None:
    """Render an embedding-space cluster-id map (analysis.py:386-501's
    embedding clustering figures) as a categorical-colormap image; optional
    `load_coastlines` overlay."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(cluster_map, extent=extent, origin="upper", cmap="tab20",
              interpolation="nearest")
    if coastlines is not None:
        overlay_coastlines(ax, coastlines)
        ax.set_xlim(extent[0], extent[1])
        ax.set_ylim(extent[2], extent[3])
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def save_mrr_by_latitude(bands, path: str, title: str = "MRR by latitude"
                         ) -> None:
    """Render `eval.analysis.mrr_by_latitude`'s numbers as the reference's
    per-latitude-band bar figure (analysis.py:322-385)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = list(bands.keys())
    vals = [bands[k] for k in labels]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar(range(len(vals)), vals)
    ax.set_xticks(range(len(vals)))
    ax.set_xticklabels(labels, rotation=30, ha="right")
    ax.set_ylabel("MRR")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
