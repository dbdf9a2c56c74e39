"""ESA WorldCover land-cover probe utility.

Counterpart of `range/utils/make_lc.py` (`LCProb`): map WorldCover RGB
palette images to class-probability vectors.  The reference discretizes
pixel-by-pixel in a Python double loop (make_lc.py:26-34); here the whole
image snaps to the nearest palette color in one vectorized argmin.
"""

from __future__ import annotations

import numpy as np

LC_CLASSES = {
    0: "Unknown", 1: "Tree Cover", 2: "Shrubland", 3: "Grassland",
    4: "Cropland", 5: "Built-up", 6: "Bare Ground", 7: "Snow/Ice",
    8: "Water", 9: "Herbaceous", 10: "Mangroves", 11: "Moss and lichen",
}

LC_PALETTE = np.array([
    (0, 0, 0), (0, 100, 0), (255, 187, 34), (255, 255, 76),
    (240, 150, 255), (250, 0, 0), (180, 180, 180), (240, 240, 240),
    (0, 100, 200), (0, 150, 160), (0, 207, 117), (250, 230, 160),
], dtype=np.float64)


class LCProb:
    """Palette snap + class-probability extraction (make_lc.py:6-51)."""

    def classify(self, img: np.ndarray) -> np.ndarray:
        """[H, W, 3] RGB -> [H, W] class indices (nearest palette color)."""
        flat = img.reshape(-1, 3).astype(np.float64)
        d2 = ((flat[:, None, :] - LC_PALETTE[None, :, :]) ** 2).sum(-1)
        return d2.argmin(1).reshape(img.shape[:2])

    def discretize_img(self, img: np.ndarray) -> np.ndarray:
        """[H, W, 3] -> palette-snapped RGB image."""
        return LC_PALETTE[self.classify(img)].astype(img.dtype)

    def im_to_prob(self, img: np.ndarray) -> dict:
        """Palette-snapped [H, W, 3] -> {class_id: pixel fraction} over all
        12 classes (make_lc.py:36-46)."""
        cls = self.classify(img)
        counts = np.bincount(cls.ravel(), minlength=len(LC_CLASSES))
        frac = counts / cls.size
        return {k: float(frac[k]) for k in LC_CLASSES}

    def prob_to_lc(self, prob: dict) -> dict:
        return {LC_CLASSES[k]: v for k, v in prob.items()}
