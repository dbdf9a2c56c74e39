"""Fit loop + full-checkpoint loader + s2geo datamodule (points mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from range_tpu.train.fit import FitConfig, fit


def test_fit_loop_with_checkpoints(tmp_path):
    from range_tpu.models.satclip import SatClipLocationConfig
    from range_tpu.models.vit import ViTConfig
    from range_tpu.train import satclip as tr

    model = tr.SatClipModel(tr.SatClipConfig(
        vision=ViTConfig(image_resolution=16, patch_size=8, width=32, layers=1,
                         heads=2, in_channels=4, output_dim=16),
        location=SatClipLocationConfig(embed_dim=16, legendre_polys=6,
                                       capacity=32, num_hidden_layers=1),
    ))
    params = model.init(jax.random.PRNGKey(0))
    opt = tr.make_optimizer(1e-3)
    step = jax.jit(tr.make_train_step(model, opt))
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)

    def batches(epoch):
        for _ in range(4):
            yield {
                "image": rng.standard_normal((16, 4, 16, 16)).astype(np.float32),
                "point": np.stack([rng.uniform(-180, 180, 16),
                                   rng.uniform(-90, 90, 16)], 1).astype(np.float32),
            }

    def eval_loss(params, batch):
        li, lc = model.forward(params, batch["image"], batch["point"])
        return tr.clip_loss(li, lc)

    ckpt_dir = str(tmp_path / "ckpt")
    params, opt_state, hist = fit(
        step, params, opt_state, batches, val_batches=lambda: batches(0),
        eval_loss_fn=jax.jit(eval_loss),
        config=FitConfig(epochs=2, log_every=2, ckpt_dir=ckpt_dir))
    assert len(hist["train_loss"]) == 2
    assert os.path.exists(os.path.join(ckpt_dir, "last.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "best.msgpack"))
    assert hist["val_loss"][-1] <= hist["val_loss"][0] + 0.5


def test_epoch_decay_schedule_matches_reference_rule():
    """lr * lr_decay**epoch with staircase epoch boundaries
    (csp/main/trainer.py:730,759)."""
    from range_tpu.train.fit import epoch_decay_schedule

    sched = epoch_decay_schedule(0.01, 0.98, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(4)) == pytest.approx(0.01)  # still epoch 0
    assert float(sched(5)) == pytest.approx(0.01 * 0.98)
    assert float(sched(12)) == pytest.approx(0.01 * 0.98 ** 2)


def test_recipe_optimizer_decays_and_clips():
    from range_tpu.train.csp_recipes import RECIPES, recipe_optimizer

    recipe = RECIPES["fmow-contsoftmax"]
    opt = recipe_optimizer(recipe, steps_per_epoch=2)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)
    # a huge gradient must be clipped to global norm <= grad_clip before Adam
    grads = {"w": 1e6 * jnp.ones((4, 4)), "b": 1e6 * jnp.ones((4,))}
    updates, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # lr schedule advances with the optimizer step count
    for _ in range(4):
        updates, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_fit_writes_metrics_file(tmp_path):
    from range_tpu.utils.metrics import read_metrics

    def step(params, opt_state, batch, rng):
        return params, opt_state, jnp.float32(1.25)

    mf = str(tmp_path / "metrics.jsonl")
    _, _, hist = fit(
        step, {}, None,
        lambda epoch: iter([{"x": np.zeros(1)}] * 4),
        val_batches=lambda: iter([{"x": np.zeros(1)}]),
        eval_loss_fn=lambda p, b: jnp.float32(2.5),
        config=FitConfig(epochs=1, log_every=2, metrics_file=mf))
    recs = read_metrics(mf)
    assert any("train_loss" in r for r in recs)
    vals = [r for r in recs if "val_loss" in r]
    assert vals and vals[-1]["val_loss"] == pytest.approx(2.5)
    assert all("step" in r and "ts" in r for r in recs)


def test_load_satclip_full_roundtrip(tmp_path):
    """Write a Lightning-style ckpt (hyper_parameters + state_dict with
    model.visual/location/logit_scale names) and load the FULL dual tower."""
    from range_tpu.convert.satclip_ckpt import load_satclip_full

    torch.manual_seed(0)
    width, layers, patch, res, in_ch, embed = 64, 2, 8, 32, 4, 16
    sd = {}
    # visual tower (CLIP naming, mirrors model_old VisionTransformer layout)
    sd["model.visual.conv1.weight"] = torch.randn(width, in_ch, patch, patch)
    sd["model.visual.class_embedding"] = torch.randn(width)
    t = (res // patch) ** 2 + 1
    sd["model.visual.positional_embedding"] = torch.randn(t, width)
    for name in ["ln_pre", "ln_post"]:
        sd[f"model.visual.{name}.weight"] = torch.ones(width)
        sd[f"model.visual.{name}.bias"] = torch.zeros(width)
    for i in range(layers):
        rb = f"model.visual.transformer.resblocks.{i}."
        sd[rb + "attn.in_proj_weight"] = torch.randn(3 * width, width) * 0.05
        sd[rb + "attn.in_proj_bias"] = torch.zeros(3 * width)
        sd[rb + "attn.out_proj.weight"] = torch.randn(width, width) * 0.05
        sd[rb + "attn.out_proj.bias"] = torch.zeros(width)
        for ln in ["ln_1", "ln_2"]:
            sd[rb + ln + ".weight"] = torch.ones(width)
            sd[rb + ln + ".bias"] = torch.zeros(width)
        sd[rb + "mlp.c_fc.weight"] = torch.randn(4 * width, width) * 0.05
        sd[rb + "mlp.c_fc.bias"] = torch.zeros(4 * width)
        sd[rb + "mlp.c_proj.weight"] = torch.randn(width, 4 * width) * 0.05
        sd[rb + "mlp.c_proj.bias"] = torch.zeros(width)
    sd["model.visual.proj"] = torch.randn(width, embed) * 0.1
    # location tower (siren, L=6 -> dim 36)
    dims = [(36, 32), (32, 32)]
    for i, (din, dout) in enumerate(dims):
        sd[f"model.location.nnet.layers.{i}.weight"] = torch.randn(dout, din) * 0.05
        sd[f"model.location.nnet.layers.{i}.bias"] = torch.zeros(dout)
    sd["model.location.nnet.last_layer.weight"] = torch.randn(embed, 32) * 0.05
    sd["model.location.nnet.last_layer.bias"] = torch.zeros(embed)
    sd["model.logit_scale"] = torch.tensor(2.659)

    ckpt = {
        "hyper_parameters": dict(
            embed_dim=embed, image_resolution=res, vision_layers=layers,
            vision_width=width, vision_patch_size=patch, in_channels=in_ch,
            le_type="sphericalharmonics", pe_type="siren", frequency_num=16,
            max_radius=360, min_radius=1, legendre_polys=6,
            harmonics_calculation="analytic", sh_embedding_dims=32,
            num_hidden_layers=2, capacity=32,
            eval_downstream=True, air_temp_data_path="", election_data_path="",
        ),
        "state_dict": sd,
    }
    path = str(tmp_path / "satclip_test.ckpt")
    torch.save(ckpt, path)

    model, params = load_satclip_full(path)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, in_ch, res, res)), jnp.float32)
    pts = jnp.asarray(np.stack([rng.uniform(-180, 180, 2),
                                rng.uniform(-90, 90, 2)], 1), jnp.float32)
    li, lc = model.forward(params, imgs, pts)
    assert li.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lc).T, rtol=1e-5)
    assert float(params["logit_scale"]) == pytest.approx(2.659, rel=1e-5)
    # visual-only path (bank-build usage, generate_db.py:231-234)
    feats = model.encode_image(params, imgs)
    assert feats.shape == (2, embed)


def test_s2geo_points_mode(tmp_path):
    import pandas as pd

    from range_tpu.data.s2geo import S2GeoDataModule, integrity_check

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    pd.DataFrame({
        "fn": [f"patch_{i}.tif" for i in range(30)],
        "lon": np.linspace(-170, 170, 30),
        "lat": np.linspace(-80, 80, 30),
    }).to_csv(os.path.join(root, "index.csv"), index=False)
    assert not integrity_check(root)  # patch files absent

    dm = S2GeoDataModule(root, batch_size=8, mode="points")
    train = list(dm.train_batches(0))
    val = list(dm.val_batches())
    n_train = sum(b["point"].shape[0] for b in train)
    n_val = sum(b["point"].shape[0] for b in val)
    assert n_train == 27 and n_val == 3
    assert train[0]["point"].shape[1] == 2
