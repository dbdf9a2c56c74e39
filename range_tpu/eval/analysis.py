"""Result analysis helpers.

Counterpart of the CSP analysis stack (`csp/main/analysis.py:322-501` MRR by
latitude band, `eval_analysis.py`): rank-based metrics sliced by geography,
plus embedding-space cluster maps via the TPU k-means (the reference uses
host sklearn clustering)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from .geo_prior import label_ranks


def mrr(pred: np.ndarray, classes: np.ndarray) -> float:
    """Mean reciprocal rank of the true class."""
    return float(np.mean(1.0 / label_ranks(pred, classes)))


def mrr_by_latitude(pred: np.ndarray, classes: np.ndarray, lats: np.ndarray,
                    n_bands: int = 6) -> Dict[str, float]:
    """MRR per latitude band (analysis.py:322-385's figure, as numbers)."""
    ranks = label_ranks(pred, classes)
    edges = np.linspace(-90, 90, n_bands + 1)
    out = {}
    for i in range(n_bands):
        sel = (lats >= edges[i]) & (lats < edges[i + 1] + (i == n_bands - 1))
        if sel.any():
            out[f"[{edges[i]:.0f},{edges[i+1]:.0f})"] = float(
                np.mean(1.0 / ranks[sel]))
    return out


def embedding_cluster_map(encoder, n_clusters: int = 12, step: float = 2.0,
                          seed: int = 0) -> np.ndarray:
    """[H, W] cluster-id map of an encoder's embedding space over the globe
    (the reference's embedding clustering maps, analysis.py:386-501), using
    the TPU k-means."""
    import jax
    import jax.numpy as jnp

    from ..eval.visualize import coord_grid
    from ..ops.kmeans import kmeans

    grid = coord_grid(step=step)
    h, w, _ = grid.shape
    coords = grid.reshape(-1, 2).astype(np.float32)
    embs = []
    bs = 8192
    for s in range(0, coords.shape[0], bs):
        chunk = coords[s:s + bs]
        pad = bs - chunk.shape[0]
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        e = np.asarray(encoder(chunk))
        embs.append(e[: bs - pad] if pad else e)
    emb = np.concatenate(embs, 0)
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    _, assign = kmeans(jax.random.PRNGKey(seed), jnp.asarray(emb, jnp.float32),
                       n_clusters, iters=10)
    return np.asarray(assign).reshape(h, w)
