"""Spherical geometry primitives (pure jnp, dtype-polymorphic).

TPU-native re-design of the reference geometry helpers
(`range/utils/utils.py:11-41` in mvrl/RANGE): everything is a pure function
over jnp arrays so it can live inside jit/vmap/shard_map traces.

Conventions (match the reference):
  * coordinates are `(lon, lat)` pairs, degrees, shape `[..., 2]`
  * radians conversion is plain `deg * pi / 180`
  * unit-sphere cartesian uses `x = cos(lat)cos(lon), y = cos(lat)sin(lon),
    z = sin(lat)` (reference `rad_to_cart`, utils.py:11-16)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

EARTH_RADIUS_KM = 6371.0


def deg2rad(x: jnp.ndarray) -> jnp.ndarray:
    return x * (math.pi / 180.0)


def rad2deg(x: jnp.ndarray) -> jnp.ndarray:
    return x * (180.0 / math.pi)


def lonlat_rad_to_xyz(lonlat_rad: jnp.ndarray) -> jnp.ndarray:
    """Radian (lon, lat) -> unit xyz.  Mirrors reference `rad_to_cart`
    (`range/utils/utils.py:11-16`).

    Args:
      lonlat_rad: [..., 2] radians.
    Returns:
      [..., 3] unit vectors.
    """
    lon = lonlat_rad[..., 0]
    lat = lonlat_rad[..., 1]
    clat = jnp.cos(lat)
    return jnp.stack([clat * jnp.cos(lon), clat * jnp.sin(lon), jnp.sin(lat)], axis=-1)


def lonlat_deg_to_xyz(lonlat_deg: jnp.ndarray) -> jnp.ndarray:
    """Degree (lon, lat) -> unit xyz."""
    return lonlat_rad_to_xyz(deg2rad(lonlat_deg))


def xyz_to_lonlat_rad(xyz: jnp.ndarray) -> jnp.ndarray:
    """Unit xyz -> radian (lon, lat)."""
    lon = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    hxy = jnp.hypot(xyz[..., 0], xyz[..., 1])
    lat = jnp.arctan2(xyz[..., 2], hxy)
    return jnp.stack([lon, lat], axis=-1)


def haversine_km(a: jnp.ndarray, b: jnp.ndarray, radians: bool = False) -> jnp.ndarray:
    """Elementwise great-circle distance in km between (lon, lat) arrays.

    Mirrors reference `compute_haversine` (`range/utils/utils.py:26-41`).
    """
    if not radians:
        a = deg2rad(a)
        b = deg2rad(b)
    lon1, lat1 = a[..., 0], a[..., 1]
    lon2, lat2 = b[..., 0], b[..., 1]
    h = (
        jnp.sin((lat2 - lat1) / 2) ** 2
        + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin((lon2 - lon1) / 2) ** 2
    )
    c = 2 * jnp.arctan2(jnp.sqrt(h), jnp.sqrt(1 - h))
    return EARTH_RADIUS_KM * c


def pairwise_haversine(x: jnp.ndarray, y: jnp.ndarray, radius: float = 1.0,
                       radians: bool = False) -> jnp.ndarray:
    """Pairwise great-circle distances: x [N,2], y [M,2] -> [N,M].

    Computed through the unit-sphere dot product (one [N,3]x[3,M] matmul, so
    it rides the MXU) instead of the reference's broadcasted trig
    (`range/evaluation/checkerboarddataset.py:78-100`).
    """
    if not radians:
        x = deg2rad(x)
        y = deg2rad(y)
    xv = lonlat_rad_to_xyz(x)
    yv = lonlat_rad_to_xyz(y)
    cos_ang = jnp.clip(xv @ yv.T, -1.0, 1.0)
    return radius * jnp.arccos(cos_ang)


def angular_similarity(x_xyz: jnp.ndarray, y_xyz: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the great-circle angle between unit vectors: [N,3]x[M,3]->[N,M]."""
    return x_xyz @ y_xyz.T


def sample_gaussian_tensors(rng, mu: jnp.ndarray, logsigma: jnp.ndarray,
                            num_samples: int) -> jnp.ndarray:
    """mu + eps * exp(logsigma), eps ~ N(0, 1): [B, S, D].
    Mirrors `range/utils/utils.py:5-8` with an explicit jax PRNG."""
    import jax

    eps = jax.random.normal(rng, (mu.shape[0], num_samples, mu.shape[1]), mu.dtype)
    return eps * jnp.exp(logsigma[:, None, :]) + mu[:, None, :]


def shifted_sigmoid(a: jnp.ndarray, inflection_point: float = 15.0) -> jnp.ndarray:
    """1 - sigmoid(a - inflection): distance-decay weight that crosses 0.5 at
    the inflection point.  Mirrors `range/utils/utils.py:18-24`."""
    return 1.0 / (1.0 + jnp.exp(a - inflection_point))


def geo_sort_order(xyz: jnp.ndarray, n_bands: int = 12) -> jnp.ndarray:
    """Spatial sort key for batches of unit vectors: latitude bands, then
    longitude within a band.  Shared by the pruned/hybrid retrieval query
    ordering and the clustered-bank relabeling so they stay correlated.

    Returns the argsort permutation."""
    lat = jnp.arcsin(jnp.clip(xyz[:, 2], -1, 1))
    lon = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    band = jnp.floor((lat + jnp.pi / 2) / (jnp.pi / n_bands))
    return jnp.argsort(band * 10.0 + lon / jnp.pi, stable=True)
