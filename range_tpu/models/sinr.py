"""SINR location encoder — pure jnp.

The reference consumes SINR through the `rshf` pip package
(`range/range.py:191-197,254-256`): `preprocess_locs` then the model, taking
256-d features.  Architecture (Cole et al., ICML 2023 "Spatial Implicit
Neural Representations" — the released geo-model): coordinate preprocessing
lon/180, lat/90 then [sin(pi x), cos(pi x)] per coordinate, into a
ResidualFCNet: Linear(4, 256) + ReLU followed by 4 residual blocks
(Linear-ReLU-Dropout-Linear-ReLU with skip — same block as the reference
FCNet, `location_encoder.py:13-31`).  Weights convert from the rshf/SINR
state_dict; without artifacts, `init` gives a seeded random model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..ops.nets import FCNet


def preprocess_locs(lonlat_deg: jnp.ndarray) -> jnp.ndarray:
    """rshf.sinr.preprocess_locs semantics: normalize to [-1, 1] then
    sin/cos-encode: [sin(pi x), sin(pi y), cos(pi x), cos(pi y)]."""
    norm = lonlat_deg / jnp.asarray([180.0, 90.0], lonlat_deg.dtype)
    rad = norm * jnp.pi
    return jnp.concatenate([jnp.sin(rad), jnp.cos(rad)], axis=-1)


@dataclasses.dataclass(frozen=True)
class SinrConfig:
    num_inputs: int = 4
    num_filts: int = 256
    num_classes: int = 47375  # released inat-range model head (unused for feats)
    depth: int = 4


class SinrLocationEncoder:
    def __init__(self, config: SinrConfig = SinrConfig()):
        self.config = config
        self.net = FCNet(num_inputs=config.num_inputs, num_classes=config.num_classes,
                         dim_hidden=config.num_filts, num_res_layers=config.depth)
        self.embedding_dim = config.num_filts

    def init(self, rng, dtype=jnp.float32):
        return self.net.init(rng, dtype=dtype)

    def apply(self, params, lonlat_deg: jnp.ndarray) -> jnp.ndarray:
        """Returns the 256-d features (the RANGE dispatcher uses the feature
        output, range.py:254-256)."""
        return self.net.features(params, preprocess_locs(lonlat_deg))

    def __call__(self, params, lonlat_deg):
        return self.apply(params, lonlat_deg)


def sinr_params_from_state_dict(sd: Dict[str, Any], dtype=jnp.float32):
    """Map a SINR/ResidualFCNet state_dict: feats.0 (input linear),
    feats.2..5 residual blocks with w1/w2, class_emb."""

    def _t(x):
        return jnp.asarray(np.asarray(x).T, dtype)

    def _v(x):
        return jnp.asarray(np.asarray(x), dtype)

    def _block_index(key):
        # numeric sort: 'feats.10' must come after 'feats.2'
        digits = [s for s in key.split(".") if s.isdigit()]
        return int(digits[-1]) if digits else 0

    res = []
    for key in sorted((k for k in sd if k.endswith(".w1.weight")),
                      key=_block_index):
        if key.endswith(".w1.weight"):
            base = key[: -len(".w1.weight")]
            res.append({
                "w1": {"w": _t(sd[base + ".w1.weight"]), "b": _v(sd[base + ".w1.bias"])},
                "w2": {"w": _t(sd[base + ".w2.weight"]), "b": _v(sd[base + ".w2.bias"])},
            })
    first = [k for k in sd if k.endswith("feats.0.weight")][0]
    base = first[: -len("0.weight")]
    params = {
        "input": {"w": _t(sd[base + "0.weight"]), "b": _v(sd[base + "0.bias"])},
        "res": res,
    }
    class_w = [k for k in sd if "class_emb.weight" in k]
    if class_w:
        params["class_emb"] = {"w": _t(sd[class_w[0]])}
    return params
