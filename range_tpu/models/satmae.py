"""SatMAE image encoder (bank high-res featurizer) + CLIP alternative.

Counterpart of `range/vision_models/satmae.py` and `clip.py`:

  * `SatMaeEncoder` — the MAE ViT-Large encoder (fmow pretrain,
    `MVRL/satmae-vitlarge-fmow-pretrain-800`) run with mask_ratio=0 and
    mean-pooled over patch tokens (satmae.py:19-21,37-39).  'Raw' = 1024-d
    pooled features; projected = extra Linear(1024, embed_dim)
    (satmae.py:17,22).
  * `ClipVisionEncoder` — CLIP ViT image tower + projection + Linear(512,
    embed_dim) (clip.py:7-20), reusing the same generalized ViT.

Checkpoints are HF-hosted (unreachable offline); `init` gives seeded random
weights of identical structure, `satmae_params_from_state_dict` converts the
real MAE state dict (timm/MAE naming).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .vit import ViTConfig, apply_vit, init_vit

SATMAE_VITL_CONFIG = ViTConfig(
    image_resolution=224,
    patch_size=16,
    width=1024,
    layers=24,
    heads=16,
    in_channels=3,
    output_dim=0,
    pool="mean",
    quick_gelu=False,  # MAE uses standard GELU
    use_ln_pre=False,  # MAE: pos_embed -> blocks directly
    patch_bias=True,  # MAE patch conv has a bias
)


class SatMaeEncoder:
    """forward_encoder(x, mask_ratio=0) -> mean over patch tokens."""

    def __init__(self, config: ViTConfig = SATMAE_VITL_CONFIG,
                 embed_dim: Optional[int] = None):
        self.config = config
        self.project = embed_dim is not None
        self.embedding_dim = embed_dim if self.project else config.width

    def init(self, rng, dtype=jnp.float32):
        kv, kp = jax.random.split(rng)
        params = {"vit": init_vit(kv, self.config, dtype=dtype)}
        if self.project:
            import math

            bound = 1.0 / math.sqrt(self.config.width)
            kw, kb = jax.random.split(kp)
            params["proj"] = {
                "w": jax.random.uniform(kw, (self.config.width, self.embedding_dim),
                                        dtype, -bound, bound),
                "b": jax.random.uniform(kb, (self.embedding_dim,), dtype, -bound, bound),
            }
        return params

    def apply(self, params, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, 3, 224, 224] -> [B, 1024] (raw) or [B, embed_dim]."""
        feats = apply_vit(params["vit"], images, self.config)
        if self.project:
            feats = feats @ params["proj"]["w"] + params["proj"]["b"]
        return feats

    def __call__(self, params, images):
        return self.apply(params, images)


def satmae_params_from_state_dict(sd: Dict[str, Any], dtype=jnp.float32) -> Dict:
    """Map an MAE-style encoder state dict (patch_embed.proj, cls_token,
    pos_embed, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    norm) into our vit layout.  Decoder weights are ignored (the reference
    also discards them, satmae.py:6-15 commented dels)."""

    def _t(x):
        return jnp.asarray(np.asarray(x).T, dtype)

    def _v(x):
        return jnp.asarray(np.asarray(x), dtype)

    conv = np.asarray(sd["patch_embed.proj.weight"])  # [W, C, P, P]
    W = conv.shape[0]
    params = {
        "patch": {
            "w": jnp.asarray(conv.reshape(W, -1).T, dtype),
            "b": _v(sd["patch_embed.proj.bias"]),
        },
        "class_embedding": _v(np.asarray(sd["cls_token"]).reshape(-1)),
        "positional_embedding": _v(np.asarray(sd["pos_embed"]).reshape(
            np.asarray(sd["pos_embed"]).shape[-2], -1)),
        "ln_post": {"g": _v(sd["norm.weight"]), "b": _v(sd["norm.bias"])},
        "blocks": [],
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        params["blocks"].append({
            "ln1": {"g": _v(sd[b + "norm1.weight"]), "b": _v(sd[b + "norm1.bias"])},
            "attn": {
                "qkv": {"w": _t(sd[b + "attn.qkv.weight"]),
                        "b": _v(sd[b + "attn.qkv.bias"])},
                "out": {"w": _t(sd[b + "attn.proj.weight"]),
                        "b": _v(sd[b + "attn.proj.bias"])},
            },
            "ln2": {"g": _v(sd[b + "norm2.weight"]), "b": _v(sd[b + "norm2.bias"])},
            "mlp": {
                "fc": {"w": _t(sd[b + "mlp.fc1.weight"]), "b": _v(sd[b + "mlp.fc1.bias"])},
                "proj": {"w": _t(sd[b + "mlp.fc2.weight"]), "b": _v(sd[b + "mlp.fc2.bias"])},
            },
        })
        i += 1
    return {"vit": params}


CLIP_VIT_CONFIGS = {
    "32": ViTConfig(image_resolution=224, patch_size=32, width=768, layers=12,
                    heads=12, in_channels=3, output_dim=512),
    "16": ViTConfig(image_resolution=224, patch_size=16, width=768, layers=12,
                    heads=12, in_channels=3, output_dim=512),
    "14L": ViTConfig(image_resolution=224, patch_size=14, width=1024, layers=24,
                     heads=16, in_channels=3, output_dim=768),
}


class ClipVisionEncoder:
    """CLIP image tower + projection + Linear(proj_dim, embed_dim) — the
    alternative bank featurizer (`range/vision_models/clip.py:7-20`)."""

    def __init__(self, vit_type: str = "16", embed_dim: int = 256):
        self.config = CLIP_VIT_CONFIGS[vit_type]
        self.embedding_dim = embed_dim

    def init(self, rng, dtype=jnp.float32):
        import math

        kv, kp = jax.random.split(rng)
        kw, kb = jax.random.split(kp)
        bound = 1.0 / math.sqrt(self.config.output_dim)
        return {
            "vit": init_vit(kv, self.config, dtype=dtype),
            "proj": {
                "w": jax.random.uniform(kw, (self.config.output_dim, self.embedding_dim),
                                        dtype, -bound, bound),
                "b": jax.random.uniform(kb, (self.embedding_dim,), dtype, -bound, bound),
            },
        }

    def apply(self, params, images):
        feats = apply_vit(params["vit"], images, self.config)
        return feats @ params["proj"]["w"] + params["proj"]["b"]

    def __call__(self, params, images):
        return self.apply(params, images)
