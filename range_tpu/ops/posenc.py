"""Positional encodings for geographic coordinates (pure jnp).

TPU-native counterpart of the reference PE library
(`range/location_models/satclip/positional_encoding/*.py`).  Each encoding is
a stateless ``PosEnc`` with a static ``embedding_dim`` and a pure
``__call__(lonlat_deg) -> [B, D]`` that is jit/vmap/shard_map friendly.  The
reference computes Theory and GridAndSphere in NumPy on the host with a
device round-trip per forward (`theory.py:61-90`, `grid_and_sphere.py:97-250`);
here everything traces into the XLA graph.

All encodings take (lon, lat) in **degrees**, shape [B, 2], matching the
reference call convention from `range/range.py:206-278`.
"""

from __future__ import annotations

import dataclasses
import math
import jax.numpy as jnp
import numpy as np

from ..geometry import deg2rad
from .sh import sh_grid_table, sh_interpolate, spherical_harmonics_basis


def cal_freq_list(freq_init: str, frequency_num: int, max_radius: float,
                  min_radius: float) -> np.ndarray:
    """Geometric frequency ladder.  Mirrors `positional_encoding/common.py:4-11`."""
    if freq_init == "random":
        return np.random.random(size=[frequency_num]) * max_radius
    if freq_init != "geometric":
        raise ValueError(f"unknown freq_init {freq_init}")
    log_timescale_increment = math.log(float(max_radius) / float(min_radius)) / (
        frequency_num * 1.0 - 1
    )
    timescales = min_radius * np.exp(
        np.arange(frequency_num).astype(float) * log_timescale_increment
    )
    return 1.0 / timescales


class PosEnc:
    """Base: a pure callable with a static embedding_dim."""

    embedding_dim: int

    def __call__(self, lonlat_deg: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Direct(PosEnc):
    """(lon, lat) degrees -> radians - pi.  Mirrors `direct.py:19-22`."""

    embedding_dim: int = 2

    def __call__(self, lonlat_deg):
        return deg2rad(lonlat_deg) - math.pi


@dataclasses.dataclass(frozen=True)
class Cartesian3D(PosEnc):
    """Unit-sphere xyz.  Mirrors `cartesian3d.py:16-25`."""

    embedding_dim: int = 3

    def __call__(self, lonlat_deg):
        c = deg2rad(lonlat_deg)
        lon, lat = c[..., 0], c[..., 1]
        return jnp.stack(
            [jnp.cos(lon) * jnp.cos(lat), jnp.sin(lon) * jnp.cos(lat), jnp.sin(lat)],
            axis=-1,
        )


@dataclasses.dataclass(frozen=True)
class Wrap(PosEnc):
    """[cos lon, sin lon, cos lat, sin lat].  Mirrors `wrap.py:17-25`."""

    embedding_dim: int = 4

    def __call__(self, lonlat_deg):
        c = deg2rad(lonlat_deg)
        lon, lat = c[..., 0], c[..., 1]
        return jnp.stack([jnp.cos(lon), jnp.sin(lon), jnp.cos(lat), jnp.sin(lat)], axis=-1)


@dataclasses.dataclass(frozen=True)
class Theory(PosEnc):
    """Space2Vec 'theory' encoder: projections on three unit vectors at 120deg,
    scaled by a geometric frequency ladder, sin/cos interleaved.

    Mirrors `theory.py:11-90` (including operating on raw degree inputs).
    Output layout per point: for each frequency f (slow axis) and direction
    d in {u1, u1, u2, u2, u3, u3}: sin at even flat index, cos at odd —
    exactly the reference's 0::2 / 1::2 pattern on the flattened
    [freq, 6] block.
    """

    frequency_num: int = 16
    max_radius: float = 10000.0
    min_radius: float = 1000.0
    freq_init: str = "geometric"

    @property
    def embedding_dim(self) -> int:
        return int(2 * 3 * self.frequency_num)

    def __call__(self, lonlat_deg):
        freqs = jnp.asarray(
            cal_freq_list(self.freq_init, self.frequency_num, self.max_radius, self.min_radius),
            dtype=lonlat_deg.dtype,
        )
        u = jnp.asarray(
            np.array(
                [
                    [1.0, 0.0],
                    [1.0, 0.0],
                    [-0.5, math.sqrt(3) / 2.0],
                    [-0.5, math.sqrt(3) / 2.0],
                    [-0.5, -math.sqrt(3) / 2.0],
                    [-0.5, -math.sqrt(3) / 2.0],
                ]
            ).T,
            dtype=lonlat_deg.dtype,
        )  # [2, 6]
        proj = lonlat_deg @ u  # [B, 6]
        ang = proj[:, None, :] * freqs[None, :, None]  # [B, F, 6]
        flat = ang.reshape(ang.shape[0], -1)  # [B, F*6]
        idx = jnp.arange(flat.shape[-1])
        return jnp.where(idx % 2 == 0, jnp.sin(flat), jnp.cos(flat))


@dataclasses.dataclass(frozen=True)
class GridAndSphere(PosEnc):
    """Space2Vec grid + Sphere2Vec {sphereC, sphereC+, sphereM, sphereM+}.

    Mirrors `grid_and_sphere.py:11-250`.  The reference duplicates each scaled
    coordinate along a trailing axis of size 2 before applying the per-variant
    trig, so every term below appears twice — we reproduce that layout exactly
    (it matters for loading reference-trained head weights).
    """

    name: str = "grid"
    frequency_num: int = 16
    max_radius: float = 0.01
    min_radius: float = 0.00001
    freq_init: str = "geometric"

    _DIM_MULT = {"grid": 4, "spherec": 6, "spherecplus": 12, "spherem": 10, "spheremplus": 16}

    @property
    def embedding_dim(self) -> int:
        return int(self._DIM_MULT[self.name] * self.frequency_num)

    def __call__(self, lonlat_deg):
        B = lonlat_deg.shape[0]
        freqs = jnp.asarray(
            cal_freq_list(self.freq_init, self.frequency_num, self.max_radius, self.min_radius),
            dtype=lonlat_deg.dtype,
        )
        # scaled[b, c, f, 2]: coordinate c scaled by frequency f, duplicated.
        scaled = lonlat_deg[:, :, None, None] * freqs[None, None, :, None]
        scaled = jnp.broadcast_to(scaled, (B, 2, self.frequency_num, 2))
        lon = scaled[:, 0]  # [B, F, 2]
        lat = scaled[:, 1]
        # raw (unscaled-by-frequency... the reference's `coords_mat` is the
        # duplicated *scaled* matrix pre-trig for grid, but spherem variants
        # read the *unscaled-duplicate* single-frequency terms from coords_mat
        # which was scaled already — see grid_and_sphere.py:110-118: coords_mat
        # is pre-multiplication, spr_embeds is post.  lon_single/lat_single
        # come from coords_mat (NOT frequency scaled).
        raw = jnp.broadcast_to(
            lonlat_deg[:, :, None, None], (B, 2, self.frequency_num, 2)
        )
        lon_single = raw[:, 0]
        lat_single = raw[:, 1]

        if self.name == "grid":
            flat = scaled.reshape(B, 2, -1)  # [B, 2, F*2]
            idx = jnp.arange(flat.shape[-1])
            out = jnp.where(idx % 2 == 0, jnp.sin(flat), jnp.cos(flat))
            return out.reshape(B, -1)
        if self.name == "spherec":
            parts = [jnp.sin(lat), jnp.cos(lat) * jnp.cos(lon), jnp.cos(lat) * jnp.sin(lon)]
        elif self.name == "spherecplus":
            parts = [
                jnp.sin(lat),
                jnp.cos(lat),
                jnp.sin(lon),
                jnp.cos(lon),
                jnp.cos(lat) * jnp.cos(lon),
                jnp.cos(lat) * jnp.sin(lon),
            ]
        elif self.name == "spherem":
            parts = [
                jnp.sin(lat),
                jnp.cos(lat) * jnp.cos(lon_single),
                jnp.cos(lat_single) * jnp.cos(lon),
                jnp.cos(lat) * jnp.sin(lon_single),
                jnp.cos(lat_single) * jnp.sin(lon),
            ]
        elif self.name == "spheremplus":
            parts = [
                jnp.sin(lat),
                jnp.cos(lat),
                jnp.sin(lon),
                jnp.cos(lon),
                jnp.cos(lat) * jnp.cos(lon_single),
                jnp.cos(lat_single) * jnp.cos(lon),
                jnp.cos(lat) * jnp.sin(lon_single),
                jnp.cos(lat_single) * jnp.sin(lon),
            ]
        else:
            raise ValueError(f"unknown grid_and_sphere variant {self.name}")
        # concat along the duplicated axis: [B, F, 2 * n_parts] then flatten.
        out = jnp.concatenate(parts, axis=-1)  # [B, F, 2*n]
        return out.reshape(B, -1)


@dataclasses.dataclass(frozen=True)
class SphericalHarmonics(PosEnc):
    """Real spherical-harmonics basis.  Mirrors `spherical_harmonics.py:9-42`.

    ``convention='analytic'`` reproduces the sympy-generated table used by the
    released SatCLIP checkpoints (see `ops/sh.py` for the two quirks).
    """

    legendre_polys: int = 10
    convention: str = "analytic"

    @property
    def embedding_dim(self) -> int:
        return int(self.legendre_polys) ** 2

    def __call__(self, lonlat_deg):
        return spherical_harmonics_basis(lonlat_deg, int(self.legendre_polys), self.convention)


class DiscretizedSphericalHarmonics(PosEnc):
    """SH evaluated on a precomputed grid + bilinear interpolation.

    Mirrors `discretized_spherical_harmonics.py:22-99`; also serves as the
    fast approximate basis (pure gather + lerp) for throughput-critical paths.
    """

    def __init__(self, legendre_polys: int = 10, n_lat: int = 181, n_lon: int = 361,
                 convention: str = "analytic"):
        self.legendre_polys = int(legendre_polys)
        self.embedding_dim = self.legendre_polys ** 2
        self.table = sh_grid_table(self.legendre_polys, n_lat, n_lon, convention)

    def __call__(self, lonlat_deg):
        return sh_interpolate(self.table, lonlat_deg)


class WeightedSphericalHarmonics:
    """Learnable-coefficient spherical harmonics: a trainable (L, M, E)
    tensor contracted against the SH basis.

    Counterpart of `spherical_harmonics_weighted.py:9-61` (not wired into the
    reference factory either — kept for completeness).  The reference loops
    per-(l, m) accumulating `SH(m,l) * coeff`; here it is one [B, L*L] basis
    matmul against the unfolded coefficient matrix, so it rides the MXU.
    """

    def __init__(self, legendre_polys: int = 10, embedding_dim: int = 16,
                 convention: str = "analytic"):
        self.L = int(legendre_polys)
        self.embedding_dim = int(embedding_dim)
        self.convention = convention
        # column j of the basis is (l_j, m_j); coeff row index mirrors
        # `get_coeffs` (weighted file :40-48): m>0 -> weight[l, m],
        # m<0 -> weight[-l, m] (negative indexing!), m=0 -> weight[l, 0]
        idx = []
        for l in range(self.L):
            for m in range(-l, l + 1):
                if m >= 0:
                    idx.append(l * self.L + m)
                else:
                    idx.append(((-l) % self.L) * self.L + (m % self.L))
        self._flat_idx = np.asarray(idx)

    def init(self, rng, dtype=jnp.float32):
        import jax

        return {"weight": 0.33 * jax.random.normal(
            rng, (self.L, self.L, self.embedding_dim), dtype)}

    def apply(self, params, lonlat_deg):
        basis = spherical_harmonics_basis(lonlat_deg, self.L, self.convention)
        flat = params["weight"].reshape(self.L * self.L, self.embedding_dim)
        coeffs = flat[jnp.asarray(self._flat_idx)]  # [L*L, E]
        return basis @ coeffs


def get_positional_encoding(
    name: str,
    legendre_polys: int = 10,
    harmonics_calculation: str = "analytic",
    min_radius: float = 1,
    max_radius: float = 360,
    frequency_num: int = 10,
) -> PosEnc:
    """Name-dispatch factory.  Mirrors `location_encoder.py:216-239`."""
    if name == "direct":
        return Direct()
    if name == "cartesian3d":
        return Cartesian3D()
    if name == "sphericalharmonics":
        if harmonics_calculation == "discretized":
            return DiscretizedSphericalHarmonics(legendre_polys=legendre_polys)
        return SphericalHarmonics(
            legendre_polys=legendre_polys,
            convention="closed-form" if harmonics_calculation == "closed-form" else "analytic",
        )
    if name == "theory":
        return Theory(min_radius=min_radius, max_radius=max_radius, frequency_num=frequency_num)
    if name == "wrap":
        return Wrap()
    if name in ("grid", "spherec", "spherecplus", "spherem", "spheremplus"):
        return GridAndSphere(
            name=name, min_radius=min_radius, max_radius=max_radius, frequency_num=frequency_num
        )
    raise ValueError(f"{name} not a known positional encoding.")
