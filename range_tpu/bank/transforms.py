"""Image/coordinate transforms for bank construction and SatCLIP training.

Counterpart of `satclip/datamodules/transforms.py` re-expressed as pure
numpy (host-side val pipeline) and jax.random (train-time augmentation under
jit on device):

  * `s2_scale_insert_b10`: Sentinel-2 /10000 scaling with the zero B10 band
    inserted at index 10 (transforms.py:74-77 — released SatCLIP expects 13
    bands while S2-100K tifs ship 12).
  * `center_crop` / `random_crop` / flips / gaussian blur
  * `rgb_val_transform`: CenterCrop + /255 + ImageNet normalization
    (transforms.py:140-153).
  * `multispec_val_transform`: /10000 + B10 + CenterCrop (:155-173).
  * `coordinate_jitter`: + U[0, 0.01) degrees ~ 1 km (:233-237).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def s2_scale_insert_b10(image: np.ndarray) -> np.ndarray:
    """[12, H, W] raw S2 DN -> [13, H, W] reflectance with zero B10."""
    image = image / 10000.0
    b10 = np.zeros((1, *image.shape[1:]), dtype=image.dtype)
    return np.concatenate([image[:10], b10, image[10:]], axis=0)


def center_crop(image: np.ndarray, size: int) -> np.ndarray:
    """[C, H, W] torch CenterCrop semantics (round-toward-zero offsets)."""
    _, h, w = image.shape
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return image[:, top:top + size, left:left + size]


def multispec_val_transform(image: np.ndarray, size: int = 256) -> np.ndarray:
    """transforms.py:155-173."""
    return center_crop(s2_scale_insert_b10(image), size)


def rgb_val_transform(image: np.ndarray, size: int = 256) -> np.ndarray:
    """transforms.py:140-153.  image: [3, H, W] uint8 or [0,255] float."""
    image = center_crop(np.asarray(image, np.float32) / 255.0, size)
    return (image - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]


def coordinate_jitter(rng: jax.Array, point: jnp.ndarray, radius: float = 0.01
                      ) -> jnp.ndarray:
    """point + U[0, radius) (transforms.py:233-237 — one-sided like the
    reference's torch.rand)."""
    return point + jax.random.uniform(rng, point.shape, point.dtype, 0.0, radius)


# --- on-device train-time augmentation (jit/vmap friendly) -----------------


def random_crop(rng: jax.Array, image: jnp.ndarray, size: int) -> jnp.ndarray:
    """[C, H, W] random crop with traceable offsets."""
    _, h, w = image.shape
    kt, kl = jax.random.split(rng)
    top = jax.random.randint(kt, (), 0, h - size + 1)
    left = jax.random.randint(kl, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(image, (0, top, left), (image.shape[0], size, size))


def random_flips(rng: jax.Array, image: jnp.ndarray) -> jnp.ndarray:
    kh, kv = jax.random.split(rng)
    image = jnp.where(jax.random.bernoulli(kh), image[:, :, ::-1], image)
    return jnp.where(jax.random.bernoulli(kv), image[:, ::-1, :], image)


def gaussian_blur3(image: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """3x3 separable gaussian blur (torch GaussianBlur(3) with fixed sigma;
    the torch default samples sigma in [0.1, 2] — training uses
    `random_gaussian_blur3` below)."""
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img = image[:, None, :, :]  # [C, 1, H, W]
    pad_h = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    img = (
        pad_h[:, :, :-2] * k[0] + pad_h[:, :, 1:-1] * k[1] + pad_h[:, :, 2:] * k[2]
    )
    pad_w = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (1, 1)), mode="edge")
    img = (
        pad_w[..., :-2] * k[0] + pad_w[..., 1:-1] * k[1] + pad_w[..., 2:] * k[2]
    )
    return img[:, 0]


def random_gaussian_blur3(rng: jax.Array, image: jnp.ndarray) -> jnp.ndarray:
    sigma = jax.random.uniform(rng, (), image.dtype, 0.1, 2.0)
    x = jnp.array([-1.0, 0.0, 1.0], image.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img = image[:, None, :, :]
    pad_h = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    img = pad_h[:, :, :-2] * k[0] + pad_h[:, :, 1:-1] * k[1] + pad_h[:, :, 2:] * k[2]
    pad_w = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (1, 1)), mode="edge")
    img = pad_w[..., :-2] * k[0] + pad_w[..., 1:-1] * k[1] + pad_w[..., 2:] * k[2]
    return img[:, 0]


def sapclip_uni_transform(rng: jax.Array, image: jnp.ndarray,
                          point: jnp.ndarray, size: int = 256,
                          scales=(1, 3, 5), scale_ratio=(1 / 3, 1 / 3, 1 / 3),
                          crop_type: str = "resized",
                          normalize: bool = False):
    """Multi-scale SAPCLIP transform (`transforms.py:176-231`): sample a
    scale, center-crop size*scale (zero-padding like torchvision when the
    image is smaller than the crop), resize (or random-crop) back to `size`,
    flips + gaussian blur, optional ImageNet normalization (for raw [0,255]
    inputs); returns (image, jittered point, scale index one-hot).

    Device-side jax version: the scale is drawn with jax PRNG and applied
    through lax.switch so the whole thing traces into one program."""
    k_scale, k_crop, k_pt, k_flip, k_blur = jax.random.split(rng, 5)
    idx = jax.random.choice(k_scale, len(scales), p=jnp.asarray(scale_ratio))

    def branch(s):
        def fn(img):
            big = center_crop_jax(img, size * s)
            if crop_type == "resized":
                return jax.image.resize(big, (img.shape[0], size, size),
                                        method="bilinear")
            return random_crop(k_crop, big, size)

        return fn

    image = jax.lax.switch(idx, [branch(s) for s in scales], image)
    image = random_flips(k_flip, image)
    image = random_gaussian_blur3(k_blur, image)
    if normalize:
        image = (image / 255.0 - jnp.asarray(IMAGENET_MEAN)[:, None, None]) /             jnp.asarray(IMAGENET_STD)[:, None, None]
    onehot = jax.nn.one_hot(idx, len(scales))
    return image, coordinate_jitter(k_pt, point), onehot


def center_crop_jax(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Traceable center crop with torchvision semantics: zero-pads first when
    the requested crop exceeds the image (CenterCrop does this too, which the
    multi-scale transform relies on for scale > 1 at patch-sized inputs)."""
    _, h, w = image.shape
    pad_h = max(0, size - h)
    pad_w = max(0, size - w)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, 0),
                                (pad_h // 2, pad_h - pad_h // 2),
                                (pad_w // 2, pad_w - pad_w // 2)))
        _, h, w = image.shape
    top = round((h - size) / 2.0)
    left = round((w - size) / 2.0)
    return jax.lax.dynamic_slice(image, (0, top, left),
                                 (image.shape[0], size, size))


def pretrained_s2_train_transform(rng: jax.Array, image: jnp.ndarray,
                                  point: jnp.ndarray, size: int = 256):
    """Device-side equivalent of `get_pretrained_s2_train_transform`
    (transforms.py:64-86): /10000 + B10 insert are host-side
    (s2_scale_insert_b10); here: random crop, flips, blur, coord jitter."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    image = random_crop(k1, image, size)
    image = random_flips(k2, image)
    image = random_gaussian_blur3(k3, image)
    return image, coordinate_jitter(k4, point)
