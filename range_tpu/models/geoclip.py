"""GeoCLIP location encoder (and its TaxaBind fine-tune) — pure jnp.

The reference consumes GeoCLIP from the `geoclip` pip package
(`range/range.py:125-138`), flipping inputs to (lat, lon) at the call site
(range.py:248,259).  Architecture (Vivanco Cepeda et al., NeurIPS 2023 —
reconstructed from the public package, weights convert from its state_dict):

  equal-earth projection of (lat, lon) degrees (scaled by SF=66.50336)
  -> 3 parallel "capsules", one per sigma in {2^0, 2^4, 2^8}:
       random Fourier features: [cos(2 pi X B_sigma^T), sin(...)] (B ~ N(0,
       sigma^2), shape [256, 2], a frozen buffer in the checkpoint)
       -> Linear(512,1024) ReLU -> Linear(1024,1024) ReLU
          -> Linear(1024,1024) ReLU -> head Linear(1024, 512)
  -> sum over capsules -> [B, 512]

TaxaBind (`range/range.py:133-138`) is the same module with a patched
state_dict.  Without the HF/pip artifacts (zero egress) `init` gives a
seeded random model of identical shape; pass a state_dict for parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# equal-earth projection constants (public projection definition)
_A1 = 1.340264
_A2 = -0.081106
_A3 = 0.000893
_A4 = 0.003796
_SF = 66.50336


def equal_earth_projection(latlon_deg: jnp.ndarray) -> jnp.ndarray:
    """[B, 2] (lat, lon) degrees -> scaled equal-earth (x, y)."""
    lat = jnp.radians(latlon_deg[:, 0])
    lon = jnp.radians(latlon_deg[:, 1])
    theta = jnp.arcsin(math.sqrt(3) / 2 * jnp.sin(lat))
    denom = 3 * (9 * _A4 * theta ** 8 + 7 * _A3 * theta ** 6 + 3 * _A2 * theta ** 2 + _A1)
    x = 2 * math.sqrt(3) * lon * jnp.cos(theta) / denom
    y = _A4 * theta ** 9 + _A3 * theta ** 7 + _A2 * theta ** 3 + _A1 * theta
    return jnp.stack([x, y], axis=1) * _SF


@dataclasses.dataclass(frozen=True)
class GeoClipConfig:
    sigmas: Sequence[float] = (2 ** 0, 2 ** 4, 2 ** 8)
    rff_dim: int = 256  # encoded pairs -> 512 features
    hidden: int = 1024
    out_dim: int = 512


class GeoClipLocationEncoder:
    def __init__(self, config: GeoClipConfig = GeoClipConfig()):
        self.config = config
        self.embedding_dim = config.out_dim

    def init(self, rng, dtype=jnp.float32):
        cfg = self.config
        capsules = []
        for i, sigma in enumerate(cfg.sigmas):
            k = jax.random.fold_in(rng, i)
            kb, k1, k2, k3, k4 = jax.random.split(k, 5)

            def lin(kk, din, dout):
                bound = 1.0 / math.sqrt(din)
                kw, kb2 = jax.random.split(kk)
                return {
                    "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
                    "b": jax.random.uniform(kb2, (dout,), dtype, -bound, bound),
                }

            capsules.append({
                "rff_b": sigma * jax.random.normal(kb, (cfg.rff_dim, 2), dtype),
                "l1": lin(k1, 2 * cfg.rff_dim, cfg.hidden),
                "l2": lin(k2, cfg.hidden, cfg.hidden),
                "l3": lin(k3, cfg.hidden, cfg.hidden),
                "head": lin(k4, cfg.hidden, cfg.out_dim),
            })
        return {"capsules": capsules}

    def apply(self, params, latlon_deg: jnp.ndarray) -> jnp.ndarray:
        """NOTE: takes (lat, lon) like the upstream package; the registry
        wrapper flips from our (lon, lat) convention (range.py:248)."""
        x = equal_earth_projection(latlon_deg)
        out = 0.0
        for cap in params["capsules"]:
            proj = 2 * math.pi * x @ cap["rff_b"].T  # [B, rff_dim]
            h = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=1)
            for name in ("l1", "l2", "l3"):
                h = jax.nn.relu(h @ cap[name]["w"] + cap[name]["b"])
            out = out + h @ cap["head"]["w"] + cap["head"]["b"]
        return out

    def __call__(self, params, latlon_deg):
        return self.apply(params, latlon_deg)


def geoclip_params_from_state_dict(sd: Dict[str, Any], dtype=jnp.float32):
    """Map the geoclip package LocationEncoder state_dict: per capsule n,
    LocEnc{n}.capsule.{0.b (RFF buffer), 1/3/5.weight+bias}, LocEnc{n}.head.0.*"""

    def _t(x):
        return jnp.asarray(np.asarray(x).T, dtype)

    def _v(x):
        return jnp.asarray(np.asarray(x), dtype)

    capsules = []
    n = 0
    while any(k.startswith(f"LocEnc{n}.") for k in sd):
        p = f"LocEnc{n}."
        capsules.append({
            "rff_b": _v(sd[p + "capsule.0.b"]),
            "l1": {"w": _t(sd[p + "capsule.1.weight"]), "b": _v(sd[p + "capsule.1.bias"])},
            "l2": {"w": _t(sd[p + "capsule.3.weight"]), "b": _v(sd[p + "capsule.3.bias"])},
            "l3": {"w": _t(sd[p + "capsule.5.weight"]), "b": _v(sd[p + "capsule.5.bias"])},
            "head": {"w": _t(sd[p + "head.0.weight"]), "b": _v(sd[p + "head.0.bias"])},
        })
        n += 1
    if not capsules:
        raise ValueError("no LocEnc{n} capsules found in state dict")
    return {"capsules": capsules}
