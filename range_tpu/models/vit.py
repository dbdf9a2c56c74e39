"""CLIP-style Vision Transformer, pure pytree params + jittable apply.

Counterpart of the reference `VisionTransformer`
(`range/location_models/satclip/model_old.py:212-246`) — the SatCLIP image
tower (ViT-B/16 over 13-band Sentinel-2 patches for the released
checkpoints) — generalized so the same code also hosts SatMAE-style encoders
(mean-pooled patch tokens, models/satmae.py).

TPU-first details:
  * the patch conv (stride == kernel) is lowered to a reshape + one MXU
    matmul instead of a convolution;
  * attention is jax.nn.dot_product_attention-compatible math in bf16-safe
    f32 accumulation;
  * params are a flat pytree so tensor-parallel NamedShardings can be mapped
    onto the MLP/attention weights (parallel use in train/satclip.py).

Weight layout converts from torch: Linear weights transposed, MHA in_proj
split into q/k/v.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_resolution: int = 256
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    in_channels: int = 13
    output_dim: int = 256
    # 'cls_proj' (CLIP, bias-free proj) | 'mean' (SatMAE-style) |
    # 'cls_head' (timm: final norm -> cls token -> Linear head with bias;
    # the moco_vit16 variant, model_old.py:304-311)
    pool: str = "cls_proj"
    quick_gelu: bool = True  # reference uses QuickGELU (model_old.py:172-174)
    use_ln_pre: bool = True  # CLIP pre-LN; MAE-style encoders skip it
    patch_bias: bool = False  # CLIP patch conv is bias-free; MAE has bias

    @property
    def grid(self) -> int:
        return self.image_resolution // self.patch_size

    @property
    def tokens(self) -> int:
        return self.grid * self.grid


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _gelu(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def init_vit(rng, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Initialization mirroring the reference scales (model_old.py:219-227:
    class/positional/proj ~ N(0,1)*width^-0.5; torch defaults elsewhere)."""
    keys = jax.random.split(rng, 6 + cfg.layers)
    w = cfg.width
    scale = w ** -0.5
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_channels

    def lin(k, din, dout):
        bound = 1.0 / math.sqrt(din)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
        }

    blocks = []
    for i in range(cfg.layers):
        k = jax.random.split(keys[6 + i], 4)
        blocks.append(
            {
                "ln1": {"g": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)},
                "attn": {
                    "qkv": lin(k[0], w, 3 * w),
                    "out": lin(k[1], w, w),
                },
                "ln2": {"g": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)},
                "mlp": {"fc": lin(k[2], w, 4 * w), "proj": lin(k[3], 4 * w, w)},
            }
        )
    patch = {"w": jax.random.normal(keys[0], (patch_dim, w), dtype) * scale}
    if cfg.patch_bias:
        patch["b"] = jnp.zeros((w,), dtype)
    params = {
        "patch": patch,  # conv, bias-free for CLIP (model_old.py:217)
        "class_embedding": jax.random.normal(keys[1], (w,), dtype) * scale,
        "positional_embedding": jax.random.normal(keys[2], (cfg.tokens + 1, w), dtype)
        * scale,
        "blocks": blocks,
        "ln_post": {"g": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)},
    }
    if cfg.use_ln_pre:
        params["ln_pre"] = {"g": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)}
    if cfg.pool == "cls_proj":
        params["proj"] = jax.random.normal(keys[3], (w, cfg.output_dim), dtype) * scale
    elif cfg.pool == "cls_head":
        params["head"] = lin(keys[4], w, cfg.output_dim)
    return params


def _patchify(x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """[B, C, H, W] -> [B, T, P*P*C] matching a stride-P conv's receptive
    fields.  Channel-last inner layout must match the torch conv weight
    reshape in convert/satclip_ckpt.py (out, in, kh, kw -> (in kh kw) x out)."""
    B, C, H, W = x.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    x = x.reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B gh gw C P P
    return x.reshape(B, gh * gw, C * P * P)


def _attention(x: jnp.ndarray, p: Params, heads: int) -> jnp.ndarray:
    B, T, W = x.shape
    hd = W // heads
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]  # [B, T, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def shape_heads(t):
        return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)  # [B, h, T, hd]

    q, k, v = map(shape_heads, (q, k, v))
    # accumulate in >= f32 (bf16 inputs accumulate f32; f64 stays f64)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_t)
    logits = logits / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=acc_t)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, W)
    return out @ p["out"]["w"] + p["out"]["b"]


def apply_vit(params: Params, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """Forward.  x: [B, C, H, W] (torch layout, matching the reference data
    pipeline).  Returns [B, output_dim] ('cls_proj') or [B, width] ('mean')."""
    tokens = _patchify(x, cfg) @ params["patch"]["w"]  # [B, T, W]
    if "b" in params["patch"]:
        tokens = tokens + params["patch"]["b"]
    B = tokens.shape[0]
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (B, 1, cfg.width)
    ).astype(tokens.dtype)
    h = jnp.concatenate([cls, tokens], axis=1) + params["positional_embedding"]
    if cfg.use_ln_pre:
        h = _ln(h, params["ln_pre"])
    for blk in params["blocks"]:
        h = h + _attention(_ln(h, blk["ln1"]), blk["attn"], cfg.heads)
        m = _ln(h, blk["ln2"])
        m = _gelu(m @ blk["mlp"]["fc"]["w"] + blk["mlp"]["fc"]["b"], cfg.quick_gelu)
        h = h + (m @ blk["mlp"]["proj"]["w"] + blk["mlp"]["proj"]["b"])
    if cfg.pool == "cls_proj":
        out = _ln(h[:, 0, :], params["ln_post"])
        return out @ params["proj"]
    if cfg.pool == "cls_head":
        out = _ln(h[:, 0, :], params["ln_post"])
        return out @ params["head"]["w"] + params["head"]["b"]
    # SatMAE-style: mean over patch tokens after final LN
    # (`range/vision_models/satmae.py:19-21,37-39` mean-pools tokens 1:)
    out = _ln(h, params["ln_post"])
    return jnp.mean(out[:, 1:, :], axis=1)
