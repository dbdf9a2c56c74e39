"""SatCLIP Lightning checkpoint -> range_tpu params.

Torch-free counterpart of `get_satclip` (`satclip/load.py:3-18`): reads the
`.ckpt` zip, rebuilds the location tower from ``hyper_parameters`` and remaps
``model.location.*`` weights into our pytree layout.

torch Linear stores weight as [out, in]; our layout is [in, out] (plain
``x @ w``), so every weight matrix is transposed once at load time.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .torch_zip import load_torch_checkpoint


def _t(x, dtype):
    return jnp.asarray(np.asarray(x).T, dtype=dtype)


def _v(x, dtype):
    return jnp.asarray(np.asarray(x), dtype=dtype)


def siren_params_from_state_dict(sd: Dict[str, Any], prefix: str, dtype) -> Dict:
    """Map reference SirenNet state dict (layers.{i}.weight/bias +
    last_layer.weight/bias, `location_encoder.py:73-112`) to our pytree."""
    layers = []
    i = 0
    while f"{prefix}layers.{i}.weight" in sd:
        layer = {"w": _t(sd[f"{prefix}layers.{i}.weight"], dtype)}
        if f"{prefix}layers.{i}.bias" in sd:
            layer["b"] = _v(sd[f"{prefix}layers.{i}.bias"], dtype)
        layers.append(layer)
        i += 1
    last = {"w": _t(sd[f"{prefix}last_layer.weight"], dtype)}
    if f"{prefix}last_layer.bias" in sd:
        last["b"] = _v(sd[f"{prefix}last_layer.bias"], dtype)
    return {"layers": layers, "last": last}


def mlp_params_from_state_dict(sd: Dict[str, Any], prefix: str, num_layers: int,
                               dtype) -> Dict:
    """Map reference MLP (`location_encoder.py:52-64`).  Sequential indices:
    0 input linear, then the *same* hidden linear repeated (tied weights, see
    ops/nets.py), final linear at the last index."""
    idxs = sorted(
        {int(k[len(prefix) + len("features.") :].split(".")[0])
         for k in sd if k.startswith(f"{prefix}features.")}
    )
    linear_idxs = [i for i in idxs if f"{prefix}features.{i}.weight" in sd]
    first, *mid, last = linear_idxs
    params = {
        "input": {
            "w": _t(sd[f"{prefix}features.{first}.weight"], dtype),
            "b": _v(sd[f"{prefix}features.{first}.bias"], dtype),
        },
        "hidden": [
            {
                "w": _t(sd[f"{prefix}features.{mid[0]}.weight"], dtype),
                "b": _v(sd[f"{prefix}features.{mid[0]}.bias"], dtype),
            }
        ]
        if mid
        else [],
        "out": {
            "w": _t(sd[f"{prefix}features.{last}.weight"], dtype),
            "b": _v(sd[f"{prefix}features.{last}.bias"], dtype),
        },
    }
    return params


def fcnet_params_from_state_dict(sd: Dict[str, Any], prefix: str, dtype) -> Dict:
    """Map reference FCNet (`location_encoder.py:13-49`)."""
    res = []
    i = 1
    while f"{prefix}feats.{i + 1}.w1.weight" in sd or f"{prefix}feats.{i}.w1.weight" in sd:
        j = i if f"{prefix}feats.{i}.w1.weight" in sd else i + 1
        res.append(
            {
                "w1": {
                    "w": _t(sd[f"{prefix}feats.{j}.w1.weight"], dtype),
                    "b": _v(sd[f"{prefix}feats.{j}.w1.bias"], dtype),
                },
                "w2": {
                    "w": _t(sd[f"{prefix}feats.{j}.w2.weight"], dtype),
                    "b": _v(sd[f"{prefix}feats.{j}.w2.bias"], dtype),
                },
            }
        )
        i = j + 1
        if len(res) > 16:  # safety
            break
    return {
        "input": {
            "w": _t(sd[f"{prefix}feats.0.weight"], dtype),
            "b": _v(sd[f"{prefix}feats.0.bias"], dtype),
        },
        "res": res,
        "class_emb": {"w": _t(sd[f"{prefix}class_emb.weight"], dtype)},
    }


def location_params_from_state_dict(sd: Dict[str, Any], pe_type: str,
                                    num_hidden_layers: int, dtype,
                                    prefix: str = "model.location.nnet.") -> Dict:
    if pe_type == "siren":
        return siren_params_from_state_dict(sd, prefix, dtype)
    if pe_type == "mlp":
        return mlp_params_from_state_dict(sd, prefix, num_hidden_layers, dtype)
    if pe_type == "fcnet":
        return fcnet_params_from_state_dict(sd, prefix, dtype)
    if pe_type == "linear":
        return {"w": _t(sd[f"{prefix}weight"], dtype), "b": _v(sd[f"{prefix}bias"], dtype)}
    raise ValueError(f"unsupported pe_type {pe_type}")


def vit_params_from_state_dict(sd: Dict[str, Any], prefix: str, dtype) -> Dict:
    """Map the reference CLIP-style VisionTransformer weights
    (`model_old.py:212-246`) into models/vit.py layout.

    conv1 [W, C, P, P] flattens to [C*P*P, W] matching _patchify's (c, i, j)
    inner order; MHA in_proj stays fused as [W, 3W] after transpose; `proj`
    is already [W, D] (used as x @ proj in the reference, no transpose).
    """
    conv = np.asarray(sd[f"{prefix}conv1.weight"])
    W = conv.shape[0]
    patch = conv.reshape(W, -1).T  # [C*P*P, W]

    def ln(name):
        return {"g": _v(sd[f"{prefix}{name}.weight"], dtype),
                "b": _v(sd[f"{prefix}{name}.bias"], dtype)}

    blocks = []
    i = 0
    while f"{prefix}transformer.resblocks.{i}.ln_1.weight" in sd:
        rb = f"{prefix}transformer.resblocks.{i}."
        blocks.append(
            {
                "ln1": ln(f"transformer.resblocks.{i}.ln_1"),
                "attn": {
                    "qkv": {
                        "w": _t(sd[rb + "attn.in_proj_weight"], dtype),
                        "b": _v(sd[rb + "attn.in_proj_bias"], dtype),
                    },
                    "out": {
                        "w": _t(sd[rb + "attn.out_proj.weight"], dtype),
                        "b": _v(sd[rb + "attn.out_proj.bias"], dtype),
                    },
                },
                "ln2": ln(f"transformer.resblocks.{i}.ln_2"),
                "mlp": {
                    "fc": {
                        "w": _t(sd[rb + "mlp.c_fc.weight"], dtype),
                        "b": _v(sd[rb + "mlp.c_fc.bias"], dtype),
                    },
                    "proj": {
                        "w": _t(sd[rb + "mlp.c_proj.weight"], dtype),
                        "b": _v(sd[rb + "mlp.c_proj.bias"], dtype),
                    },
                },
            }
        )
        i += 1
    params = {
        "patch": {"w": jnp.asarray(patch, dtype)},
        "class_embedding": _v(sd[f"{prefix}class_embedding"], dtype),
        "positional_embedding": _v(sd[f"{prefix}positional_embedding"], dtype),
        "ln_pre": ln("ln_pre"),
        "blocks": blocks,
        "ln_post": ln("ln_post"),
    }
    if f"{prefix}proj" in sd:
        params["proj"] = _v(sd[f"{prefix}proj"], dtype)
    return params


def timm_vit_params_from_state_dict(sd: Dict[str, Any], prefix: str,
                                    output_dim: int, dtype) -> Dict:
    """Map timm `vit_small_patch16_224`-style weights — the `moco_vit16`
    vision variant (model_old.py:304-311) — into models/vit.py layout
    (pool='cls_head', use_ln_pre=False, quick_gelu=False, patch_bias=True).

    timm naming: patch_embed.proj, cls_token [1,1,W], pos_embed [1,T+1,W],
    blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm, head.
    torchgeo moco weights ship without `head` (loaded strict=False upstream);
    it falls back to zeros, trainable per the upstream recipe.
    """
    conv = np.asarray(sd[f"{prefix}patch_embed.proj.weight"])
    W = conv.shape[0]

    def ln(name):
        return {"g": _v(sd[f"{prefix}{name}.weight"], dtype),
                "b": _v(sd[f"{prefix}{name}.bias"], dtype)}

    def linear(name):
        return {"w": _t(sd[f"{prefix}{name}.weight"], dtype),
                "b": _v(sd[f"{prefix}{name}.bias"], dtype)}

    blocks = []
    i = 0
    while f"{prefix}blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        blocks.append({
            "ln1": ln(b + "norm1"),
            "attn": {"qkv": linear(b + "attn.qkv"),
                     "out": linear(b + "attn.proj")},
            "ln2": ln(b + "norm2"),
            "mlp": {"fc": linear(b + "mlp.fc1"),
                    "proj": linear(b + "mlp.fc2")},
        })
        i += 1
    params = {
        "patch": {"w": jnp.asarray(conv.reshape(W, -1).T, dtype),
                  "b": _v(sd[f"{prefix}patch_embed.proj.bias"], dtype)},
        "class_embedding": _v(
            np.asarray(sd[f"{prefix}cls_token"]).reshape(-1), dtype),
        "positional_embedding": _v(
            np.asarray(sd[f"{prefix}pos_embed"])[0], dtype),
        "blocks": blocks,
        "ln_post": ln("norm"),
    }
    if f"{prefix}head.weight" in sd:
        params["head"] = linear("head")
    else:
        params["head"] = {"w": jnp.zeros((W, output_dim), dtype),
                          "b": jnp.zeros((output_dim,), dtype)}
    return params


def load_satclip_checkpoint(ckpt_path: str, dtype=jnp.float32):
    """Returns (SatClipLocationEncoder, params) — `get_satclip(...,
    return_all=False)` semantics (`satclip/load.py:16-18`)."""
    from ..models.satclip import SatClipLocationConfig, SatClipLocationEncoder

    ckpt = load_torch_checkpoint(ckpt_path)
    hp = dict(ckpt["hyper_parameters"])
    config = SatClipLocationConfig.from_hyper_parameters(hp)
    encoder = SatClipLocationEncoder(config)
    sd = ckpt["state_dict"]
    params = location_params_from_state_dict(
        sd, config.pe_type, config.num_hidden_layers, dtype
    )
    return encoder, params


def load_satclip_full(ckpt_path: str, dtype=jnp.float32):
    """`get_satclip(..., return_all=True)` semantics (`satclip/load.py:15-16`):
    the full dual tower — (SatClipModel, params) with visual + location +
    logit_scale — e.g. for bank construction, which uses `.visual`
    (`generate_db.py:231-234`).

    All vision branches of `model_old.py:274-311` are supported: int
    `vision_layers` -> CLIP ViT, tuple/list -> ModifiedResNet,
    'moco_resnet18'/'moco_resnet50' -> timm-layout standard ResNet,
    'moco_vit16' -> timm-layout ViT-small (cls_head pooling)."""
    from ..models.resnet import ResNetConfig, resnet_params_from_state_dict
    from ..models.resnet_std import (
        RESNET18, RESNET50, dataclasses_replace_dims,
        std_resnet_params_from_state_dict)
    from ..models.satclip import SatClipLocationConfig
    from ..models.vit import ViTConfig
    from ..train.satclip import SatClipConfig, SatClipModel

    ckpt = load_torch_checkpoint(ckpt_path)
    hp = dict(ckpt["hyper_parameters"])
    vision_layers = hp.get("vision_layers", 12)
    if vision_layers in ("moco_resnet18", "moco_resnet50"):
        base = RESNET18 if vision_layers == "moco_resnet18" else RESNET50
        vision = dataclasses_replace_dims(
            base, output_dim=hp.get("embed_dim", 256),
            in_channels=hp.get("in_channels", 13))
        vision_params = lambda sd: std_resnet_params_from_state_dict(
            sd, "model.visual.", vision, dtype)
    elif vision_layers == "moco_vit16":
        # timm vit_small_patch16_224 geometry (model_old.py:304-311)
        vision = ViTConfig(
            image_resolution=224, patch_size=16, width=384, layers=12,
            heads=6, in_channels=hp.get("in_channels", 13),
            output_dim=hp.get("embed_dim", 256), pool="cls_head",
            quick_gelu=False, use_ln_pre=False, patch_bias=True)
        vision_params = lambda sd: timm_vit_params_from_state_dict(
            sd, "model.visual.", hp.get("embed_dim", 256), dtype)
    elif isinstance(vision_layers, (tuple, list)):
        vision = ResNetConfig(
            layers=tuple(vision_layers),
            output_dim=hp.get("embed_dim", 256),
            width=hp.get("vision_width", 64),
            input_resolution=hp.get("image_resolution", 256),
            in_channels=hp.get("in_channels", 13),
        )
        vision_params = lambda sd: resnet_params_from_state_dict(
            sd, "model.visual.", vision, dtype)
    elif isinstance(vision_layers, int):
        vision = ViTConfig(
            image_resolution=hp.get("image_resolution", 256),
            patch_size=hp.get("vision_patch_size", 16),
            width=hp.get("vision_width", 768),
            layers=vision_layers,
            heads=hp.get("vision_width", 768) // 64,  # model_old.py:315
            in_channels=hp.get("in_channels", 13),
            output_dim=hp.get("embed_dim", 256),
        )
        vision_params = lambda sd: vit_params_from_state_dict(
            sd, "model.visual.", dtype)
    else:
        raise NotImplementedError(
            f"vision_layers={vision_layers!r}: only ViT/ResNet branches convert")
    config = SatClipConfig(
        vision=vision, location=SatClipLocationConfig.from_hyper_parameters(hp))
    model = SatClipModel(config)
    sd = ckpt["state_dict"]
    params = {
        "visual": vision_params(sd),
        "location": location_params_from_state_dict(
            sd, config.location.pe_type, config.location.num_hidden_layers, dtype),
        "logit_scale": _v(sd["model.logit_scale"], dtype),
    }
    return model, params
