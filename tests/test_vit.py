"""ViT parity vs a torch transcription of the reference CLIP VisionTransformer
(model_old.py:212-246 uses timm/torchgeo-free primitives for the ViT branch,
reconstructed here from torch.nn since timm isn't installed)."""

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from range_tpu.convert.satclip_ckpt import vit_params_from_state_dict
from range_tpu.models.vit import ViTConfig, apply_vit, init_vit


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d, d * 4)),
            ("gelu", _QuickGELU()),
            ("c_proj", nn.Linear(d * 4, d)),
        ]))
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class _TorchViT(nn.Module):
    """Same math as reference VisionTransformer forward (model_old.py:229-246)."""

    def __init__(self, res, patch, width, layers, heads, in_ch, out_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, width, kernel_size=patch, stride=patch, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn((res // patch) ** 2 + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Sequential(
            OrderedDict([("resblocks", nn.Sequential(*[_Block(width, heads) for _ in range(layers)]))])
        )
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, out_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


def test_vit_parity():
    torch.manual_seed(0)
    cfg = ViTConfig(image_resolution=32, patch_size=8, width=64, layers=2,
                    heads=4, in_channels=5, output_dim=16)
    ref = _TorchViT(32, 8, 64, 2, 4, 5, 16).double().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = vit_params_from_state_dict(sd, "", jnp.float64)
    x = np.random.default_rng(0).standard_normal((3, 5, 32, 32))
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()
    got = np.asarray(apply_vit(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-10)


def test_vit_mean_pool_shapes():
    cfg = ViTConfig(image_resolution=32, patch_size=8, width=64, layers=1,
                    heads=4, in_channels=3, output_dim=0, pool="mean")
    import jax
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 3, 32, 32))
    out = apply_vit(params, x, cfg)
    assert out.shape == (2, 64)
