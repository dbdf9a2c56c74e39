"""Bank construction pipeline: transforms parity vs torch(vision) semantics,
SatMAE encoder parity vs a torch MAE-encoder transcription, end-to-end db
build -> load_model round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from range_tpu.bank import transforms as tf
from range_tpu.bank.build import SyntheticPairedData, create_database
from range_tpu.models.satmae import (SATMAE_VITL_CONFIG, SatMaeEncoder,
                                     satmae_params_from_state_dict)
from range_tpu.models.vit import ViTConfig


def test_s2_transform_shapes_and_b10():
    img = np.random.default_rng(0).uniform(0, 10000, (12, 300, 300)).astype(np.float32)
    out = tf.multispec_val_transform(img, 256)
    assert out.shape == (13, 256, 256)
    assert np.all(out[10] == 0)  # inserted zero B10 band
    assert out.max() <= 1.0 + 1e-6


def test_center_crop_semantics():
    """torchvision CenterCrop offsets: round((dim - size) / 2)."""
    img = np.arange(3 * 301 * 280).reshape(3, 301, 280).astype(np.float32)
    ours = tf.center_crop(img, 256)
    top, left = round((301 - 256) / 2.0), round((280 - 256) / 2.0)
    np.testing.assert_array_equal(ours, img[:, top:top + 256, left:left + 256])


def test_rgb_val_transform_semantics():
    rng = np.random.default_rng(2)
    img_u8 = rng.integers(0, 256, (3, 300, 300), dtype=np.uint8)
    ours = tf.rgb_val_transform(img_u8, 256)
    crop = tf.center_crop(img_u8.astype(np.float32), 256) / 255.0
    expect = (crop - tf.IMAGENET_MEAN[:, None, None]) / tf.IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(ours, expect, rtol=1e-6)
    assert ours.shape == (3, 256, 256)


class _TorchMAEBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn_qkv = nn.Linear(d, 3 * d)
        self.attn_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, d)
        self.h = h

    def forward(self, x):
        B, T, D = x.shape
        y = self.norm1(x)
        qkv = self.attn_qkv(y).reshape(B, T, 3, self.h, D // self.h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) / (D // self.h) ** 0.5
        att = att.softmax(-1)
        y = (att @ v).transpose(1, 2).reshape(B, T, D)
        x = x + self.attn_proj(y)
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


class _TorchMAE(nn.Module):
    """Minimal MAE-encoder transcription (mask_ratio=0 path + mean pooling,
    matching vision_models/satmae.py:37-39)."""

    def __init__(self, res, patch, d, layers, heads, in_ch):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, d, patch, patch)
        t = (res // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, t + 1, d) * 0.02)
        self.blocks = nn.ModuleList([_TorchMAEBlock(d, heads) for _ in range(layers)])
        self.norm = nn.LayerNorm(d)

    def forward(self, x):
        x = self.proj(x).flatten(2).transpose(1, 2)  # [B, T, D]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], 1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:, :].mean(1)


def test_satmae_encoder_parity():
    torch.manual_seed(0)
    cfg = ViTConfig(image_resolution=32, patch_size=8, width=64, layers=2,
                    heads=4, in_channels=3, output_dim=0, pool="mean",
                    quick_gelu=False, use_ln_pre=False, patch_bias=True)
    ref = _TorchMAE(32, 8, 64, 2, 4, 3).double().eval()
    sd = {}
    raw = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd["patch_embed.proj.weight"] = raw["proj.weight"]
    sd["patch_embed.proj.bias"] = raw["proj.bias"]
    sd["cls_token"] = raw["cls_token"]
    sd["pos_embed"] = raw["pos_embed"]
    sd["norm.weight"] = raw["norm.weight"]
    sd["norm.bias"] = raw["norm.bias"]
    for i in range(2):
        sd[f"blocks.{i}.norm1.weight"] = raw[f"blocks.{i}.norm1.weight"]
        sd[f"blocks.{i}.norm1.bias"] = raw[f"blocks.{i}.norm1.bias"]
        sd[f"blocks.{i}.attn.qkv.weight"] = raw[f"blocks.{i}.attn_qkv.weight"]
        sd[f"blocks.{i}.attn.qkv.bias"] = raw[f"blocks.{i}.attn_qkv.bias"]
        sd[f"blocks.{i}.attn.proj.weight"] = raw[f"blocks.{i}.attn_proj.weight"]
        sd[f"blocks.{i}.attn.proj.bias"] = raw[f"blocks.{i}.attn_proj.bias"]
        sd[f"blocks.{i}.norm2.weight"] = raw[f"blocks.{i}.norm2.weight"]
        sd[f"blocks.{i}.norm2.bias"] = raw[f"blocks.{i}.norm2.bias"]
        sd[f"blocks.{i}.mlp.fc1.weight"] = raw[f"blocks.{i}.fc1.weight"]
        sd[f"blocks.{i}.mlp.fc1.bias"] = raw[f"blocks.{i}.fc1.bias"]
        sd[f"blocks.{i}.mlp.fc2.weight"] = raw[f"blocks.{i}.fc2.weight"]
        sd[f"blocks.{i}.mlp.fc2.bias"] = raw[f"blocks.{i}.fc2.bias"]
    params = satmae_params_from_state_dict(sd, jnp.float64)
    enc = SatMaeEncoder(cfg)
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32))
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(x, jnp.float64)))
    np.testing.assert_allclose(got, expect, rtol=1e-8, atol=1e-9)


def test_create_database_end_to_end():
    """Tiny towers -> build db -> npz schema -> RANGE+ loads and runs."""
    import range_tpu

    sat_cfg = ViTConfig(image_resolution=256, patch_size=64, width=32, layers=1,
                        heads=2, in_channels=13, output_dim=16)
    mae_cfg = ViTConfig(image_resolution=224, patch_size=56, width=48, layers=1,
                        heads=2, in_channels=3, output_dim=0, pool="mean",
                        quick_gelu=False, use_ln_pre=False, patch_bias=True)
    from range_tpu.models.vit import apply_vit, init_vit

    sat_params = init_vit(jax.random.PRNGKey(0), sat_cfg)
    mae = SatMaeEncoder(mae_cfg)
    mae_params = mae.init(jax.random.PRNGKey(1))

    bank = create_database(
        lambda p, x: mae.apply(p, x), mae_params,
        lambda p, x: apply_vit(p, x, sat_cfg), sat_params,
        SyntheticPairedData(n=40, batch_size=16),
    )
    assert int(bank.n_valid) == 40
    assert bank.value_dim == 48 and bank.key_dim == 16

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "db.npz")
        bank.save_npz(path)
        loaded = np.load(path)
        assert set(loaded.keys()) == {"locs", "image_embeddings", "satclip_embeddings"}
        assert loaded["image_embeddings"].shape == (40, 48)


def test_sapclip_uni_transform():
    """Multi-scale SAPCLIP transform: shape-stable, scale one-hot valid."""
    from range_tpu.bank.transforms import sapclip_uni_transform

    img = jnp.asarray(np.random.default_rng(0).standard_normal((3, 1280, 1280)),
                      jnp.float32)
    pt = jnp.asarray([10.0, 20.0])
    # patch-sized input (256x256): scale>1 branches must zero-pad, not crash
    small = jnp.asarray(np.random.default_rng(1).standard_normal((3, 256, 256)),
                        jnp.float32)
    out_s, _, _ = sapclip_uni_transform(jax.random.PRNGKey(0), small, pt, size=256)
    assert out_s.shape == (3, 256, 256)
    seen = set()
    for seed in range(8):
        out, pt2, onehot = sapclip_uni_transform(jax.random.PRNGKey(seed), img,
                                                 pt, size=256)
        assert out.shape == (3, 256, 256)
        assert float(jnp.sum(onehot)) == 1.0
        assert float(pt2[0]) >= 10.0  # one-sided jitter
        seen.add(int(jnp.argmax(onehot)))
    assert len(seen) >= 2  # multiple scales sampled


def test_load_bird_data(tmp_path):
    import json, os

    from range_tpu.data.inat import load_bird_data

    rng = np.random.default_rng(0)
    entries = []
    for i in range(20):
        entries.append({
            "valid_image": i % 5 != 0,
            "im_path": f"img_{i}.jpg",
            "class_id": int(rng.integers(0, 4)),
            "orig_meta": {
                "user_id": None if i == 1 else int(rng.integers(0, 3)),
                "lon": float(rng.uniform(-180, 180)),
                "lat": float(rng.uniform(-90, 90)),
                "date": 0.3,
            },
        })
    path = os.path.join(str(tmp_path), "birdsnap_meta.json")
    with open(path, "w") as f:
        json.dump({"train": entries, "valid": entries[:4]}, f)
    locs, classes, users, dates, valid = load_bird_data(
        str(tmp_path), "birdsnap_meta.json", "train", remove_empty=True)
    assert locs.shape[0] == classes.shape[0] == users.shape[0]
    assert np.all(users >= 0)
    assert locs.shape[0] < 20  # invalid images + missing users dropped
