"""moco vision variants (model_old.py:286-311): standard timm-layout
ResNet-18/50 and ViT-small towers + converters.

timm/torchgeo are not installed, so the oracles are raw-torch transcriptions
of the standard architectures (torchvision ResNet forward / timm pre-norm ViT
block), built with the exact state-dict naming the converters consume.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from range_tpu.models.resnet_std import (
    RESNET18, RESNET50, StdResNetConfig, apply_std_resnet, init_std_resnet,
    std_resnet_params_from_state_dict, trainable_mask)


class _TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class _TorchBottleneck(nn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class _TorchResNet(nn.Module):
    """torchvision-naming standard ResNet."""

    def __init__(self, cfg: StdResNetConfig):
        super().__init__()
        w = cfg.width
        self.conv1 = nn.Conv2d(cfg.in_channels, w, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        blk = _TorchBasicBlock if cfg.block == "basic" else _TorchBottleneck
        exp = cfg.expansion
        cin = w
        for s, n in enumerate(cfg.layers):
            planes = w * 2 ** s
            blocks = []
            for i in range(n):
                blocks.append(blk(cin, planes, 2 if (s > 0 and i == 0) else 1))
                cin = planes * exp
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, cfg.output_dim)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return self.fc(x.mean(dim=(2, 3)))


def _randomize_bn(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)


@pytest.mark.parametrize("base", [RESNET18, RESNET50],
                         ids=["resnet18", "resnet50"])
def test_std_resnet_parity(base):
    cfg = StdResNetConfig(layers=(1, 1, 1, 1), block=base.block,
                          output_dim=16, width=8, in_channels=4)
    torch.manual_seed(0)
    model = _TorchResNet(cfg).double().eval()
    _randomize_bn(model, 1)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = std_resnet_params_from_state_dict(sd, "", cfg, dtype=jnp.float64)

    x = np.random.default_rng(2).standard_normal((2, 4, 64, 64))
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_std_resnet(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_std_resnet_missing_fc_and_mask():
    cfg = StdResNetConfig(layers=(1, 1, 1, 1), output_dim=8, width=8,
                          in_channels=3)
    torch.manual_seed(3)
    model = _TorchResNet(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if not k.startswith("fc.")}
    params = std_resnet_params_from_state_dict(sd, "", cfg)
    assert float(jnp.abs(params["fc"]["w"]).max()) == 0.0
    mask = trainable_mask(params)
    leaves = jax.tree_util.tree_leaves(mask)
    assert sum(leaves) == 2  # fc w + b only
    assert mask["fc"]["w"] is True and mask["conv1"]["w"] is False
    out = apply_std_resnet(
        jax.tree.map(lambda t: t.astype(jnp.float32), params),
        jnp.zeros((1, 3, 64, 64), jnp.float32), cfg)
    assert out.shape == (1, 8)


def test_std_resnet_init_shapes():
    params = init_std_resnet(jax.random.PRNGKey(0), RESNET50)
    assert params["stages"][3][0]["conv3"]["w"].shape == (2048, 512, 1, 1)
    assert params["fc"]["w"].shape == (2048, 256)
    p18 = init_std_resnet(jax.random.PRNGKey(1), RESNET18)
    assert p18["fc"]["w"].shape == (512, 256)


# --- timm ViT-small (moco_vit16) ----------------------------------------


class _TimmAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, T, C = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, T, C)
        return self.proj(x)


class _TimmBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.ModuleDict(dict(fc1=nn.Linear(dim, dim * 4),
                                      fc2=nn.Linear(dim * 4, dim)))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))
        return x + h


class _TimmViT(nn.Module):
    """timm vit_*_patch naming: patch_embed.proj, cls_token, pos_embed,
    blocks.{i}.*, norm, head; cls-token pooling."""

    def __init__(self, img=32, patch=16, dim=24, layers=2, heads=2,
                 in_chans=4, num_classes=16):
        super().__init__()
        t = (img // patch) ** 2
        self.patch_embed = nn.ModuleDict(
            dict(proj=nn.Conv2d(in_chans, dim, patch, patch)))
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim).normal_(std=0.02))
        self.pos_embed = nn.Parameter(torch.zeros(1, t + 1, dim).normal_(std=0.02))
        self.blocks = nn.ModuleList([_TimmBlock(dim, heads)
                                     for _ in range(layers)])
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def test_timm_vit_parity():
    from range_tpu.convert.satclip_ckpt import timm_vit_params_from_state_dict
    from range_tpu.models.vit import ViTConfig, apply_vit

    torch.manual_seed(4)
    model = _TimmViT().double().eval()
    cfg = ViTConfig(image_resolution=32, patch_size=16, width=24, layers=2,
                    heads=2, in_channels=4, output_dim=16, pool="cls_head",
                    quick_gelu=False, use_ln_pre=False, patch_bias=True)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = timm_vit_params_from_state_dict(sd, "", 16, jnp.float64)

    x = np.random.default_rng(5).standard_normal((2, 4, 32, 32))
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_vit(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_moco_full_checkpoint_roundtrip(tmp_path):
    """A 'moco_resnet18' Lightning-style ckpt (string vision_layers) loads
    through load_satclip_full with the frozen-backbone semantics."""
    import sys
    sys.path.insert(0, "tests")
    from reference_loader import load_reference_location_encoder
    from range_tpu.convert.satclip_ckpt import load_satclip_full
    from range_tpu.models.resnet_std import StdResNetConfig

    cfg = StdResNetConfig(output_dim=16, width=8, in_channels=5)
    torch.manual_seed(6)
    tcfg = StdResNetConfig(layers=(2, 2, 2, 2), output_dim=16, width=64,
                           in_channels=5)
    model_torch = _TorchResNet(tcfg).eval()
    ref_le = load_reference_location_encoder()
    torch.manual_seed(7)
    net = ref_le.SirenNet(dim_in=100, dim_hidden=32, dim_out=16, num_layers=2)
    sd = {f"model.visual.{k}": v for k, v in model_torch.state_dict().items()}
    sd.update({f"model.location.nnet.{k}": v
               for k, v in net.state_dict().items()})
    sd["model.logit_scale"] = torch.tensor(float(np.log(1 / 0.07)))
    ckpt = {"hyper_parameters": dict(
                embed_dim=16, vision_layers="moco_resnet18", in_channels=5,
                le_type="sphericalharmonics", pe_type="siren",
                legendre_polys=10, harmonics_calculation="closed-form",
                num_hidden_layers=2, capacity=32),
            "state_dict": sd}
    path = str(tmp_path / "moco18.ckpt")
    torch.save(ckpt, path)

    model, params = load_satclip_full(path)
    assert isinstance(model.config.vision, StdResNetConfig)
    assert model.config.vision.in_channels == 5
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 5, 64, 64)),
                    jnp.float32)
    with torch.no_grad():
        ref = model_torch(torch.from_numpy(np.asarray(x, np.float64))
                          .float()).numpy()
    ours = np.asarray(model.encode_image(params, x))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
