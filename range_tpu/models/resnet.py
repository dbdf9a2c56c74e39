"""CLIP-style ModifiedResNet vision tower — pure pytree, inference-first.

Counterpart of the reference's ResNet branch of SatCLIP
(`model_old.py:16-160`): 3-conv stem with avgpool, anti-aliased Bottleneck
stages (avgpool before strided convs), and the QKV `AttentionPool2d` head
(:64-97) instead of global average pooling.  Selected upstream when
`vision_layers` is a tuple (model_old.py:274-284).

BatchNorm runs with stored running statistics (inference).  For contrastive
TRAINING prefer the ViT branch (models/vit.py) — matching torch BN
minibatch-stat semantics under pmap/shard_map is out of scope here and
documented as such.

Convolutions keep the torch OIHW weight layout (lax.conv dimension numbers
handle it), so the converter is copy-only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

_DN = ("NCHW", "OIHW", "NCHW")


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2, dimension_numbers=_DN)


def _bn(x, p, eps=1e-5):
    """Inference batchnorm with running stats; params [C]."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    scale = (p["g"] * inv)[None, :, None, None]
    bias = (p["b"] - p["mean"] * p["g"] * inv)[None, :, None, None]
    return x * scale + bias


def _avg_pool(x, k):
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID") / (k * k)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    output_dim: int = 256
    width: int = 64
    input_resolution: int = 224
    in_channels: int = 13

    @property
    def heads(self) -> int:
        return self.width * 32 // 64  # model_old.py:276


def _bottleneck(params, x, stride):
    """model_old.py:16-61: conv1-bn-relu, conv2-bn-relu, avgpool(stride),
    conv3-bn, (+ downsample), relu."""
    out = jax.nn.relu(_bn(_conv(x, params["conv1"]["w"]), params["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, params["conv2"]["w"], padding=1), params["bn2"]))
    out = _avg_pool(out, stride)
    out = _bn(_conv(out, params["conv3"]["w"]), params["bn3"])
    if "downsample" in params:
        identity = _avg_pool(x, stride)
        identity = _bn(_conv(identity, params["downsample"]["conv"]["w"]),
                       params["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attnpool(params, x, heads):
    """AttentionPool2d (model_old.py:64-97): mean token queries all tokens
    through separately-projected multi-head attention."""
    B, C, H, W = x.shape
    tokens = x.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, HW, C]
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + params["positional_embedding"][None]
    q = tokens[:, :1] @ params["q"]["w"] + params["q"]["b"]  # [B, 1, C]
    k = tokens @ params["k"]["w"] + params["k"]["b"]
    v = tokens @ params["v"]["w"] + params["v"]["b"]
    hd = C // heads

    def heads_of(t):
        return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = map(heads_of, (q, k, v))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))
    probs = jax.nn.softmax(logits / math.sqrt(hd), axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return out @ params["c"]["w"] + params["c"]["b"]


def apply_resnet(params: Params, x: jnp.ndarray, cfg: ResNetConfig) -> jnp.ndarray:
    """[B, C, H, W] -> [B, output_dim] (model_old.py:144-160)."""
    h = jax.nn.relu(_bn(_conv(x, params["conv1"]["w"], stride=2, padding=1),
                        params["bn1"]))
    h = jax.nn.relu(_bn(_conv(h, params["conv2"]["w"], padding=1), params["bn2"]))
    h = jax.nn.relu(_bn(_conv(h, params["conv3"]["w"], padding=1), params["bn3"]))
    h = _avg_pool(h, 2)
    for stage_idx, stage in enumerate(params["stages"]):
        for block_idx, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            h = _bottleneck(block, h, stride)
    return _attnpool(params["attnpool"], h, cfg.heads)


def init_resnet(rng, cfg: ResNetConfig, dtype=jnp.float32) -> Params:
    """Random init with reference scales (attnpool std = C^-0.5,
    model_old.py:336-343; zero-init bn3 gains, :345-348)."""
    keys = iter(jax.random.split(rng, 4 + sum(cfg.layers) * 8 + 8))

    def conv(cin, cout, k):
        fan_in = cin * k * k
        return {"w": jax.random.normal(next(keys), (cout, cin, k, k), dtype)
                / math.sqrt(fan_in)}

    def bn(c, zero=False):
        return {"g": jnp.zeros((c,), dtype) if zero else jnp.ones((c,), dtype),
                "b": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    w = cfg.width
    params = {
        "conv1": conv(cfg.in_channels, w // 2, 3), "bn1": bn(w // 2),
        "conv2": conv(w // 2, w // 2, 3), "bn2": bn(w // 2),
        "conv3": conv(w // 2, w, 3), "bn3": bn(w),
        "stages": [],
    }
    inplanes = w
    for stage_idx, blocks in enumerate(cfg.layers):
        planes = w * (2 ** stage_idx)
        stage = []
        for block_idx in range(blocks):
            p = {
                "conv1": conv(inplanes, planes, 1), "bn1": bn(planes),
                "conv2": conv(planes, planes, 3), "bn2": bn(planes),
                "conv3": conv(planes, planes * 4, 1), "bn3": bn(planes * 4, zero=True),
            }
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            if stride > 1 or inplanes != planes * 4:
                p["downsample"] = {"conv": conv(inplanes, planes * 4, 1),
                                   "bn": bn(planes * 4)}
            stage.append(p)
            inplanes = planes * 4
        params["stages"].append(stage)
    C = w * 32
    std = C ** -0.5

    def lin(din, dout, s):
        return {"w": s * jax.random.normal(next(keys), (din, dout), dtype),
                "b": jnp.zeros((dout,), dtype)}

    spacial = cfg.input_resolution // 32
    params["attnpool"] = {
        "positional_embedding": std * jax.random.normal(
            next(keys), (spacial ** 2 + 1, C), dtype),
        "q": lin(C, C, std), "k": lin(C, C, std), "v": lin(C, C, std),
        "c": lin(C, cfg.output_dim, std),
    }
    return params


def resnet_params_from_state_dict(sd: Dict[str, Any], prefix: str,
                                  cfg: ResNetConfig, dtype=jnp.float32) -> Params:
    """Map the torch ModifiedResNet state dict (model_old.py naming:
    conv{1..3}/bn{1..3} stem, layer{1..4}.{i}.*, attnpool.{q,k,v,c}_proj +
    positional_embedding)."""

    def _v(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), dtype)

    def bn(name):
        return {"g": _v(f"{name}.weight"), "b": _v(f"{name}.bias"),
                "mean": _v(f"{name}.running_mean"), "var": _v(f"{name}.running_var")}

    params = {
        "conv1": {"w": _v("conv1.weight")}, "bn1": bn("bn1"),
        "conv2": {"w": _v("conv2.weight")}, "bn2": bn("bn2"),
        "conv3": {"w": _v("conv3.weight")}, "bn3": bn("bn3"),
        "stages": [],
    }
    for stage_idx in range(len(cfg.layers)):
        stage = []
        for i in range(cfg.layers[stage_idx]):
            base = f"layer{stage_idx + 1}.{i}."
            p = {
                "conv1": {"w": _v(base + "conv1.weight")}, "bn1": bn(base + "bn1"),
                "conv2": {"w": _v(base + "conv2.weight")}, "bn2": bn(base + "bn2"),
                "conv3": {"w": _v(base + "conv3.weight")}, "bn3": bn(base + "bn3"),
            }
            if prefix + base + "downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": {"w": _v(base + "downsample.0.weight")},
                    "bn": bn(base + "downsample.1"),
                }
            stage.append(p)
        params["stages"].append(stage)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd[prefix + name + ".weight"]).T, dtype),
                "b": _v(name + ".bias")}

    params["attnpool"] = {
        "positional_embedding": _v("attnpool.positional_embedding"),
        "q": lin("attnpool.q_proj"), "k": lin("attnpool.k_proj"),
        "v": lin("attnpool.v_proj"), "c": lin("attnpool.c_proj"),
    }
    return params
