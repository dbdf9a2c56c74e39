"""Full lifecycle integration: pretrain SatCLIP -> build a bank with its
visual tower -> serve RANGE+ -> downstream probe.  Everything tiny, CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import range_tpu
from range_tpu.bank.build import SyntheticPairedData, create_database
from range_tpu.models.range_encoder import RangeConfig, RangeEncoder
from range_tpu.models.satclip import SatClipLocationConfig
from range_tpu.models.vit import ViTConfig
from range_tpu.train import satclip as tr
from range_tpu.train.fit import FitConfig, fit
from range_tpu.utils.guard import guarded_step


def test_full_lifecycle(tmp_path):
    # 1. pretrain a tiny SatCLIP (13-band images like S2)
    model = tr.SatClipModel(tr.SatClipConfig(
        vision=ViTConfig(image_resolution=16, patch_size=8, width=32, layers=1,
                         heads=2, in_channels=13, output_dim=16),
        location=SatClipLocationConfig(embed_dim=16, legendre_polys=6,
                                       capacity=32, num_hidden_layers=1),
    ))
    params = model.init(jax.random.PRNGKey(0))
    opt = tr.make_optimizer(1e-3)
    step = jax.jit(guarded_step(tr.make_train_step(model, opt)))
    rng = np.random.default_rng(0)

    def batches(epoch):
        for _ in range(6):
            yield {
                "image": rng.standard_normal((16, 13, 16, 16)).astype(np.float32),
                "point": np.stack([rng.uniform(-180, 180, 16),
                                   rng.uniform(-90, 90, 16)], 1).astype(np.float32),
            }

    params, _, hist = fit(step, params, opt.init(params), batches,
                          config=FitConfig(epochs=2, log_every=100,
                                           ckpt_dir=str(tmp_path)))
    assert np.isfinite(hist["train_loss"]).all()

    # 2. build a bank with the TRAINED visual tower as the key featurizer
    def visual_fn(p, x):
        return model.encode_image({"visual": p}, x)

    from range_tpu.models.satmae import SatMaeEncoder

    mae = SatMaeEncoder(ViTConfig(image_resolution=224, patch_size=56, width=48,
                                  layers=1, heads=2, in_channels=3, output_dim=0,
                                  pool="mean", quick_gelu=False,
                                  use_ln_pre=False, patch_bias=True))
    mae_params = mae.init(jax.random.PRNGKey(1))
    bank = create_database(
        lambda p, x: mae.apply(p, x), mae_params,
        visual_fn, params["visual"],
        SyntheticPairedData(n=96, batch_size=32,
                            multispec_shape=(13, 16, 16)),
    )
    assert bank.key_dim == 16 and bank.value_dim == 48

    # 3. serve RANGE+ with the trained LOCATION tower as the query encoder
    enc = RangeEncoder(model.location, bank,
                       RangeConfig(mode="range+", chunk=128, use_pallas=False))
    coords = jnp.asarray(np.stack([rng.uniform(-180, 180, 32),
                                   rng.uniform(-90, 90, 32)], 1), jnp.float32)
    out = enc.apply(params["location"], coords)
    assert out.shape == (32, 48 + 16)
    assert np.all(np.isfinite(np.asarray(out)))
