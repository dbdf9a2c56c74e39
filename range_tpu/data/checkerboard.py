"""Synthetic spherical-checkerboard task: the one reusable test fixture the
reference ships (and its only encoder-capacity "test").

Counterpart of `range/evaluation/checkerboarddataset.py`: a Fibonacci lattice
of ``num_support`` seed points with cyclic class labels; samples get the label
of the great-circle-nearest seed.  Train/valid draw points from an isotropic
Gaussian on the sphere with numpy RandomState(seed) exactly as the reference
(checkerboarddataset.py:222-231), so datasets match sample-for-sample; eval
uses a dense lattice grid (:215-220)."""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np


def fibonacci_lattice(n: int, n_classes: int = 16) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mirrors `generate_fibonaccilattice` (checkerboarddataset.py:12-36):
    n is halved; i in [-n/2, n/2); lat = asin(2i / (2(n/2)+1)); lon = (i mod
    golden) * 360/golden wrapped into [-180, 180]; labels cycle mod classes."""
    half = n // 2
    phi = (1 + math.sqrt(5)) / 2
    i = np.arange(-half, half).astype(float)
    lat = np.degrees(np.arcsin((2 * i) / (2 * half + 1)))
    lon = np.mod(i, phi) * (360.0 / phi)
    lon = np.where(lon > 180, lon - 360, lon)
    lon = np.where(lon < -180, lon + 360, lon)
    labels = (np.arange(-half, half) % n_classes).astype(np.int64)
    return lon, lat, labels


def pairwise_haversine(lon1, lat1, lon2, lat2, radius=1.0):
    """[N2, N1] pairwise great-circle distances — note the transposed output
    orientation matching `haversine_distance` (checkerboarddataset.py:78-100),
    which `assign_closest_label` relies on (argmin over axis 0)."""
    lon1, lat1, lon2, lat2 = map(np.radians, (lon1, lat1, lon2, lat2))
    dlon = lon2[:, None] - lon1
    dlat = lat2[:, None] - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2[:, None]) * np.sin(dlon / 2) ** 2
    return radius * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))


def assign_closest_label(lons_q, lats_q, lons_seed, lats_seed, labels_seed):
    d = pairwise_haversine(lons_q, lats_q, lons_seed, lats_seed)
    return labels_seed[d.argmin(0)]


def sample_points(n_samples: int, n_support: int, n_classes: int, seed: int = 0,
                  grid: bool = False):
    """Mirrors `get_data` (checkerboarddataset.py:209-233).  Returns
    (lonlat [N,2] float64, labels [N] int64)."""
    lons, lats, labels = fibonacci_lattice(n_support, n_classes=n_classes)
    if grid:
        lons_g, lats_g, _ = fibonacci_lattice(n_samples)
        y = assign_closest_label(lons_g, lats_g, lons, lats, labels)
        return np.stack([lons_g, lats_g], 1), y
    rng = np.random.RandomState(seed)
    x, yy, z = rng.normal(size=(3, n_samples))
    az = np.arctan2(yy, x)
    el = np.arctan2(z, np.hypot(x, yy))
    lons_s, lats_s = np.degrees(az), np.degrees(el)
    y = assign_closest_label(lons_s, lats_s, lons, lats, labels)
    return np.stack([lons_s, lats_s], 1), y


def resolution_deg(n: int) -> float:
    """Approx average inter-point distance in degrees
    (checkerboarddataset.py:199-203)."""
    area = 4 * math.pi / n
    return math.degrees(math.sqrt(area / math.pi))


@dataclasses.dataclass
class CheckerDataset:
    """Train (seed 0), valid (seed 1), eval (lattice grid) splits — mirrors
    `CheckerDataset` (checkerboarddataset.py:235-256)."""

    num_samples: int = 5000
    num_classes: int = 4
    num_support: int = 200

    def __post_init__(self):
        self.train = sample_points(self.num_samples, self.num_support,
                                   self.num_classes, seed=0)
        self.valid = sample_points(self.num_samples, self.num_support,
                                   self.num_classes, seed=1)
        self.evalu = sample_points(self.num_samples, self.num_support,
                                   self.num_classes, grid=True)
