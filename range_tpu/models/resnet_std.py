"""Standard (torchvision/timm-layout) ResNet-18/50 — the moco vision variants.

The reference's `moco_resnet18` / `moco_resnet50` vision towers
(model_old.py:286-303) are `timm.create_model("resnet{18,50}", in_chans,
num_classes=embed_dim)` loaded with torchgeo SENTINEL2_ALL_MOCO weights:
a plain ResNet — 7x7/2 stem + 3x3/2 maxpool, Basic/Bottleneck stages,
global average pool, linear head.  This is that network as a jittable
pytree, plus a converter from the timm/torchvision state-dict naming
(conv1, bn1, layer{1..4}.{i}.*, fc) so those released weights drop in.

The upstream recipe freezes the backbone and trains only `fc`
(model_old.py:292-293); `trainable_mask` reproduces that for optax.
BatchNorm uses stored running statistics (inference semantics — the frozen
backbone never updates them upstream either).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import _bn, _conv

Params = Any


@dataclasses.dataclass(frozen=True)
class StdResNetConfig:
    layers: Tuple[int, ...] = (2, 2, 2, 2)  # resnet18
    block: str = "basic"  # 'basic' (18/34) | 'bottleneck' (50/101)
    output_dim: int = 256
    width: int = 64
    in_channels: int = 13

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4


RESNET18 = StdResNetConfig()
RESNET50 = StdResNetConfig(layers=(3, 4, 6, 3), block="bottleneck")


def _max_pool_3x3s2(x):
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def _basic_block(p, x, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["w"], stride=stride, padding=1),
                          p["bn1"]))
    out = _bn(_conv(out, p["conv2"]["w"], padding=1), p["bn2"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"]["w"], stride=stride),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _bottleneck_block(p, x, stride):
    # torchvision/timm put the stride on conv2 (no anti-aliasing avgpool,
    # unlike the CLIP ModifiedResNet in models/resnet.py)
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["w"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]["w"], stride=stride, padding=1),
                          p["bn2"]))
    out = _bn(_conv(out, p["conv3"]["w"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"]["w"], stride=stride),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def apply_std_resnet(params: Params, x: jnp.ndarray,
                     cfg: StdResNetConfig) -> jnp.ndarray:
    """[B, C, H, W] -> [B, output_dim]."""
    h = jax.nn.relu(_bn(_conv(x, params["conv1"]["w"], stride=2, padding=3),
                        params["bn1"]))
    h = _max_pool_3x3s2(h)
    block = _basic_block if cfg.block == "basic" else _bottleneck_block
    for stage_idx, stage in enumerate(params["stages"]):
        for block_idx, p in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            h = block(p, h, stride)
    h = jnp.mean(h, axis=(2, 3))  # global average pool
    return h @ params["fc"]["w"] + params["fc"]["b"]


def init_std_resnet(rng, cfg: StdResNetConfig, dtype=jnp.float32) -> Params:
    n_keys = 2 + sum(cfg.layers) * 8
    keys = iter(jax.random.split(rng, n_keys))

    def conv(cin, cout, k):
        # torch kaiming_normal_(fan_out, relu): std = sqrt(2 / (k*k*cout))
        std = math.sqrt(2.0 / (k * k * cout))
        return {"w": std * jax.random.normal(next(keys), (cout, cin, k, k), dtype)}

    def bn(c):
        return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    params = {"conv1": conv(cfg.in_channels, cfg.width, 7),
              "bn1": bn(cfg.width), "stages": []}
    inplanes = cfg.width
    exp = cfg.expansion
    for stage_idx, blocks in enumerate(cfg.layers):
        planes = cfg.width * (2 ** stage_idx)
        stage = []
        for block_idx in range(blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            if cfg.block == "basic":
                p = {"conv1": conv(inplanes, planes, 3), "bn1": bn(planes),
                     "conv2": conv(planes, planes, 3), "bn2": bn(planes)}
            else:
                p = {"conv1": conv(inplanes, planes, 1), "bn1": bn(planes),
                     "conv2": conv(planes, planes, 3), "bn2": bn(planes),
                     "conv3": conv(planes, planes * exp, 1), "bn3": bn(planes * exp)}
            if stride > 1 or inplanes != planes * exp:
                p["downsample"] = {"conv": conv(inplanes, planes * exp, 1),
                                   "bn": bn(planes * exp)}
            stage.append(p)
            inplanes = planes * exp
        params["stages"].append(stage)
    feat = cfg.width * 8 * exp
    bound = 1.0 / math.sqrt(feat)
    kw, kb = jax.random.split(next(keys))
    params["fc"] = {"w": jax.random.uniform(kw, (feat, cfg.output_dim), dtype,
                                            -bound, bound),
                    "b": jax.random.uniform(kb, (cfg.output_dim,), dtype,
                                            -bound, bound)}
    return params


def std_resnet_params_from_state_dict(sd: Dict[str, Any], prefix: str,
                                      cfg: StdResNetConfig,
                                      dtype=jnp.float32) -> Params:
    """timm/torchvision naming: conv1, bn1, layer{1..4}.{i}.conv{j}/bn{j}/
    downsample.0/.1, fc.  Missing `fc` (torchgeo moco weights ship without a
    classification head, loaded `strict=False` upstream) falls back to zeros."""

    def _v(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), dtype)

    def bn(name):
        return {"g": _v(f"{name}.weight"), "b": _v(f"{name}.bias"),
                "mean": _v(f"{name}.running_mean"), "var": _v(f"{name}.running_var")}

    params = {"conv1": {"w": _v("conv1.weight")}, "bn1": bn("bn1"), "stages": []}
    n_convs = 2 if cfg.block == "basic" else 3
    for stage_idx in range(len(cfg.layers)):
        stage = []
        for i in range(cfg.layers[stage_idx]):
            base = f"layer{stage_idx + 1}.{i}."
            p = {}
            for j in range(1, n_convs + 1):
                p[f"conv{j}"] = {"w": _v(base + f"conv{j}.weight")}
                p[f"bn{j}"] = bn(base + f"bn{j}")
            if prefix + base + "downsample.0.weight" in sd:
                p["downsample"] = {"conv": {"w": _v(base + "downsample.0.weight")},
                                   "bn": bn(base + "downsample.1")}
            stage.append(p)
        params["stages"].append(stage)
    feat = cfg.width * 8 * cfg.expansion
    if prefix + "fc.weight" in sd:
        params["fc"] = {"w": jnp.asarray(np.asarray(sd[prefix + "fc.weight"]).T,
                                         dtype),
                        "b": _v("fc.bias")}
    else:
        params["fc"] = {"w": jnp.zeros((feat, cfg.output_dim), dtype),
                        "b": jnp.zeros((cfg.output_dim,), dtype)}
    return params


def trainable_mask(params: Params) -> Params:
    """True only on `fc` — the upstream moco recipe freezes the backbone and
    fine-tunes the head (model_old.py:292-293).  Feed to
    `optax.masked(optimizer, mask)`."""
    mask = jax.tree.map(lambda _: False, params)
    mask["fc"] = jax.tree.map(lambda _: True, params["fc"])
    return mask


def dataclasses_replace_dims(base: StdResNetConfig, *, output_dim: int,
                             in_channels: int) -> StdResNetConfig:
    """The two fields the checkpoint hyper-parameters override."""
    return dataclasses.replace(base, output_dim=output_dim,
                               in_channels=in_channels)
