"""S2-100K dataset reader + data module for SatCLIP pretraining.

Counterpart of `satclip/datamodules/s2geo_dataset.py` (`S2Geo` at :81-216 and
`S2GeoDataModule` at :19-79): 100k 256x256 12-band Sentinel-2 patches with an
index.csv of (fn, lon, lat).  Torch-free: batches are numpy dicts
{'image': [B, 13, 256, 256] (B10-inserted reflectance), 'point': [B, 2]};
'points' mode skips image IO entirely (s2geo_dataset.py mode arg).

The tif reader needs rasterio (not in this image) — gated; `integrity_check`
mirrors `_check_integrity` (:175-186).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np

from ..bank.transforms import s2_scale_insert_b10

VALIDATION_FILENAMES = [
    "index.csv",
    "images/",
    "images/patch_0.tif",
    "images/patch_99999.tif",
]


def integrity_check(root: str) -> bool:
    """Mirrors `S2Geo._check_integrity` (s2geo_dataset.py:175-186)."""
    return all(os.path.exists(os.path.join(root, f)) for f in VALIDATION_FILENAMES)


@dataclasses.dataclass
class S2GeoDataset:
    root: str
    mode: str = "both"  # 'both' | 'points'

    def __post_init__(self):
        assert self.mode in ("both", "points")
        import pandas as pd

        self.index = pd.read_csv(os.path.join(self.root, "index.csv"))

    def __len__(self):
        return len(self.index)

    def points(self) -> np.ndarray:
        return self.index[["lon", "lat"]].to_numpy(np.float32)

    def read_image(self, i: int) -> np.ndarray:  # pragma: no cover - rasterio
        import rasterio

        fn = os.path.join(self.root, "images", self.index.iloc[i]["fn"])
        with rasterio.open(fn) as f:
            return s2_scale_insert_b10(f.read().astype(np.float32))


class S2GeoDataModule:
    """Shuffled train/val split + numpy batch iterators, replacing the
    Lightning module (s2geo_dataset.py:19-79)."""

    def __init__(self, data_dir: str, batch_size: int = 64,
                 val_random_split_fraction: float = 0.1, seed: int = 0,
                 mode: str = "both"):
        self.dataset = S2GeoDataset(data_dir, mode=mode)
        self.batch_size = batch_size
        n = len(self.dataset)
        n_val = int(n * val_random_split_fraction)
        perm = np.random.default_rng(seed).permutation(n)
        self.val_idx = perm[:n_val]
        self.train_idx = perm[n_val:]

    def _batches(self, idx: np.ndarray, shuffle: bool, seed: int) -> Iterator[dict]:
        if shuffle:
            idx = np.random.default_rng(seed).permutation(idx)
        pts = self.dataset.points()
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            batch = {"point": pts[chunk]}
            if self.dataset.mode == "both":  # pragma: no cover - rasterio
                batch["image"] = np.stack(
                    [self.dataset.read_image(int(i)) for i in chunk])
            yield batch

    def train_batches(self, epoch: int = 0) -> Iterator[dict]:
        return self._batches(self.train_idx, shuffle=True, seed=epoch)

    def val_batches(self) -> Iterator[dict]:
        return self._batches(self.val_idx, shuffle=False, seed=0)
