"""Geo-prior evaluation: combine image-classifier predictions with spatial
priors, fully vectorized.

Counterpart of the CSP eval stack (`csp/main/eval_helper.py:18-260`
compute_acc/compute_acc_batch with priors, `csp/main/baselines.py` GridPrior/
neighbor/kde priors).  The reference loops per example through sklearn
BallTrees (eval_helper.py:62-96); here every prior is one batched
distance computation through the unit-sphere dot product (an MXU matmul) —
the per-query neighborhoods fall out of masked reductions.

Priors (each returns [B, num_classes] to be multiplied into cnn preds):
  * `train_freq_prior`     — class frequency (eval_helper.py:54-58)
  * `neighbor_prior`       — radius or kNN counts (baselines.py:6-24)
  * `GridPrior`            — lat/lon histogram with beta pseudo-counts
                             (baselines.py:27-66)
  * `kde_prior`            — adaptive-bandwidth gaussian KDE (baselines.py:100-138)
  * a location-encoder model used directly as prior (eval_helper.py:104-125)

`compute_topk_acc` mirrors the top-{1,3,5,10} metrics of compute_acc.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lonlat_deg_to_xyz


def _pairwise_hav(eval_locs: jnp.ndarray, train_locs: jnp.ndarray) -> jnp.ndarray:
    """[B, N] great-circle distances (radians) via xyz dot products."""
    a = lonlat_deg_to_xyz(eval_locs.astype(jnp.float32))
    b = lonlat_deg_to_xyz(train_locs.astype(jnp.float32))
    cos = jnp.clip(a @ b.T, -1.0, 1.0)
    return jnp.arccos(cos)


def train_freq_prior(train_classes: np.ndarray, num_classes: int) -> np.ndarray:
    """[num_classes] normalized class frequency."""
    cnt = np.bincount(train_classes, minlength=num_classes).astype(np.float64) + 1
    return cnt / cnt.sum()


def neighbor_prior(train_classes: jnp.ndarray, num_classes: int,
                   eval_locs: jnp.ndarray, train_locs: jnp.ndarray,
                   *, ptype: str = "distance", dist_thresh: float = 0.05,
                   num_neighbors: int = 100) -> jnp.ndarray:
    """Vectorized `compute_neighbor_prior` (baselines.py:6-24): uniform 1s
    plus class counts of neighbors within a haversine radius ('distance') or
    the k nearest ('knn'), renormalized per query.

    Returns [B, num_classes]."""
    d = _pairwise_hav(eval_locs, train_locs)  # [B, N]
    if ptype == "distance":
        w = (d <= dist_thresh).astype(jnp.float32)
    elif ptype == "knn":
        _, idx = jax.lax.top_k(-d, num_neighbors)
        w = jnp.zeros_like(d).at[jnp.arange(d.shape[0])[:, None], idx].set(1.0)
    else:
        raise ValueError(ptype)
    onehot = jax.nn.one_hot(train_classes, num_classes, dtype=jnp.float32)  # [N, K]
    counts = w @ onehot  # [B, K]
    prior = counts + 1.0
    return prior / jnp.sum(prior, axis=1, keepdims=True)


class GridPrior:
    """Histogram prior with beta pseudo-counts (baselines.py:27-66),
    vectorized eval (one gather instead of a per-loc python call)."""

    def __init__(self, locs: np.ndarray, classes: np.ndarray, num_classes: int,
                 gp_size=(180, 90), pseudo_count: float = 2.0):
        self.lon_bins, self.lat_bins = gp_size
        lon_idx = np.clip(((locs[:, 0] + 180) / 360.0 * self.lon_bins).astype(int),
                          0, self.lon_bins - 1)
        lat_idx = np.clip(((locs[:, 1] + 90) / 180.0 * self.lat_bins).astype(int),
                          0, self.lat_bins - 1)
        flat = lat_idx * self.lon_bins + lon_idx
        denom = np.bincount(flat, minlength=self.lat_bins * self.lon_bins).astype(float)
        denom += num_classes * pseudo_count - num_classes
        grid = np.zeros((self.lat_bins * self.lon_bins, num_classes))
        np.add.at(grid, (flat, classes), 1.0)
        grid += pseudo_count - 1
        self.grid = grid / denom[:, None]
        self.uniform = np.full(num_classes, 1.0 / num_classes)

    def eval(self, locs: np.ndarray) -> np.ndarray:
        """[B, 2] -> [B, num_classes]."""
        lon_idx = np.clip(((locs[:, 0] + 180) / 360.0 * self.lon_bins).astype(int),
                          0, self.lon_bins - 1)
        lat_idx = np.clip(((locs[:, 1] + 90) / 180.0 * self.lat_bins).astype(int),
                          0, self.lat_bins - 1)
        out = self.grid[lat_idx * self.lon_bins + lon_idx]
        bad = np.isnan(locs[:, 0])
        if bad.any():
            out = np.where(bad[:, None], self.uniform[None, :], out)
        return out


def kde_prior(train_classes: jnp.ndarray, train_locs: jnp.ndarray,
              num_classes: int, eval_locs: jnp.ndarray, *, kde_nb: int = 100
              ) -> jnp.ndarray:
    """Adaptive-bandwidth spherical KDE (baselines.py:100-138), vectorized:
    per query, bandwidth = half the distance to the kde_nb-th neighbor; the
    gaussian kernel is evaluated against ALL train points (the reference's
    2*bandwidth radius truncation only changes O(e^-2) mass)."""
    d = _pairwise_hav(eval_locs, train_locs)  # [B, N] radians
    knn_d, _ = jax.lax.top_k(-d, kde_nb)
    bw = 0.5 * (-knn_d[:, -1])  # [B]
    bw = jnp.maximum(bw, 1e-4)
    q = (2 * jnp.pi * bw[:, None]) ** -1.0 * jnp.exp(-(d ** 2) / (2 * bw[:, None] ** 2))
    onehot = jax.nn.one_hot(train_classes, num_classes, dtype=jnp.float32)
    num = q @ onehot  # [B, K]
    num = num + jnp.min(jnp.where(num > 0, num, jnp.inf), axis=1, keepdims=True)
    return num / jnp.sum(num, axis=1, keepdims=True)


def combine(cnn_preds: Optional[jnp.ndarray], prior: jnp.ndarray) -> jnp.ndarray:
    """pred = cnn * prior (eval_helper.py:54-123); prior-only when no cnn."""
    if cnn_preds is None:
        return prior
    return cnn_preds * prior


def compute_acc(val_preds: Optional[np.ndarray], val_classes: np.ndarray,
                val_locs: Optional[np.ndarray] = None,
                train_classes: Optional[np.ndarray] = None,
                train_locs: Optional[np.ndarray] = None,
                prior_type: str = "no_prior", prior=None,
                num_classes: Optional[int] = None,
                hyper_params: Optional[dict] = None,
                val_feats: Optional[np.ndarray] = None,
                ks: Sequence[int] = (1, 3, 5, 10)) -> Dict[int, float]:
    """Prior-type dispatch mirroring `compute_acc`/`compute_acc_batch`
    (`csp/main/eval_helper.py:18-260`), fully batched.

    prior_type: 'no_prior' | 'train_freq' | 'nn_dist' | 'nn_knn' | 'kde' |
    'grid' (prior = GridPrior) | 'model'/'geo_net' (prior = callable
    locs -> [B, K], the trained location model's class distribution;
    samples with nan locations are dropped, eval_helper.py:104-126) |
    'tang_et_al' (prior = callable (locs, val_feats) -> [B, K] log-probs,
    eval_helper.py:129-140 + TangNet).
    """
    hp = hyper_params or {}
    if num_classes is None:
        num_classes = val_preds.shape[1] if val_preds is not None else int(
            np.max(train_classes)) + 1
    if prior_type in ("model", "geo_net", "tang_et_al"):
        # model priors can't score unlocated samples: drop nan-loc rows
        ok = ~np.isnan(np.asarray(val_locs)[:, 0])
        val_locs = np.asarray(val_locs)[ok]
        val_classes = np.asarray(val_classes)[ok]
        if val_preds is not None:
            val_preds = np.asarray(val_preds)[ok]
        if val_feats is not None:
            val_feats = np.asarray(val_feats)[ok]
    if prior_type == "no_prior":
        p = None
    elif prior_type == "train_freq":
        p = train_freq_prior(np.asarray(train_classes), num_classes)[None, :]
    elif prior_type in ("nn_dist", "nn_knn"):
        p = neighbor_prior(
            jnp.asarray(train_classes), num_classes, jnp.asarray(val_locs),
            jnp.asarray(train_locs),
            ptype="distance" if prior_type == "nn_dist" else "knn",
            dist_thresh=hp.get("dist_thresh", 0.05),
            num_neighbors=hp.get("num_neighbors", 100))
    elif prior_type == "kde":
        p = kde_prior(jnp.asarray(train_classes), jnp.asarray(train_locs),
                      num_classes, jnp.asarray(val_locs),
                      kde_nb=hp.get("kde_nb", 100))
    elif prior_type == "grid":
        p = prior.eval(np.asarray(val_locs))
    elif prior_type in ("model", "geo_net"):
        p = prior(np.asarray(val_locs))
    elif prior_type == "tang_et_al":
        # TangNet outputs log-softmax over classes; it IS the prediction
        # (not multiplied into cnn preds), eval_helper.py:133-140
        p = np.exp(np.asarray(prior(np.asarray(val_locs),
                                    np.asarray(val_feats))))
        val_preds = None
    else:
        raise ValueError(f"unknown prior_type {prior_type}")
    if p is None:
        pred = np.asarray(val_preds)
    else:
        pred = np.asarray(combine(
            jnp.asarray(val_preds) if val_preds is not None else None,
            jnp.asarray(p)))
    return compute_topk_acc(pred, val_classes, ks)


def compute_topk_acc(pred: np.ndarray, classes: np.ndarray,
                     ks: Sequence[int] = (1, 3, 5, 10)) -> Dict[int, float]:
    """Top-k accuracies (compute_acc's metric set, eval_helper.py:238-243)."""
    order = np.argsort(-np.asarray(pred), axis=1)
    out = {}
    for k in ks:
        hits = (order[:, :k] == np.asarray(classes)[:, None]).any(1)
        out[k] = float(hits.mean())
    return out


def label_ranks(pred: np.ndarray, classes: np.ndarray) -> np.ndarray:
    """1-based rank of the true class per sample (`get_label_rank`,
    eval_helper.py:185-215)."""
    order = np.argsort(-np.asarray(pred), axis=1)
    ranks = np.argsort(order, axis=1) + 1
    return ranks[np.arange(pred.shape[0]), np.asarray(classes)]


# cross-validated prior hyperparameters per dataset
# (`csp/main/eval_helper.py:435-497` get_cross_val_hyper_params)
_CROSS_VAL_HP = {
    "inat_2018": dict(num_neighbors=1500, dist_type="euclidean",
                      dist_thresh=2.0, gp_size=(180, 60), pseudo_count=2,
                      kde_dist_type="euclidean", kde_quant=5.0, kde_nb=700),
    "inat_2017": dict(num_neighbors=1450, dist_type="euclidean",
                      dist_thresh=5.0, gp_size=(45, 30), pseudo_count=2,
                      kde_dist_type="euclidean", kde_quant=5.0, kde_nb=700),
    ("birdsnap", "ebird_meta"): dict(
        num_neighbors=700, dist_type="euclidean", dist_thresh=5.0,
        gp_size=(30, 30), pseudo_count=2, kde_dist_type="euclidean",
        kde_quant=0.001, kde_nb=500),
    ("birdsnap", "orig_meta"): dict(
        num_neighbors=100, dist_type="euclidean", dist_thresh=9.0,
        gp_size=(225, 60), pseudo_count=2, kde_dist_type="euclidean",
        kde_quant=0.001, kde_nb=600),
    "nabirds": dict(num_neighbors=500, dist_type="euclidean", dist_thresh=6.0,
                    gp_size=(45, 60), pseudo_count=2,
                    kde_dist_type="euclidean", kde_quant=0.001, kde_nb=600),
    "yfcc": dict(num_neighbors=75, dist_type="haversine",
                 dist_thresh=2.0 / 6371.4, gp_size=(540, 150), pseudo_count=3,
                 kde_dist_type="euclidean", kde_quant=0.001, kde_nb=300),
}


def cross_val_hyper_params(dataset: str, meta_type: str = "orig_meta") -> dict:
    """Cross-validated prior hyperparameters for a dataset (eval_helper.py:
    435-497); birdsnap differs by metadata source."""
    key = (dataset, meta_type) if dataset == "birdsnap" else dataset
    if key not in _CROSS_VAL_HP:
        raise KeyError(f"no cross-validated hyper-params for {dataset!r}")
    return dict(_CROSS_VAL_HP[key])
