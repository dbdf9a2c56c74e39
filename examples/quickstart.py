"""range_tpu quickstart: the full reference workflow end-to-end.

Runs everything with synthetic artifacts (the real SatCLIP checkpoint and
RANGE database are HF-hosted):

  1. build a retrieval bank with `create_database` (tiny towers)
  2. load RANGE+ through the public factory and embed coordinates
  3. dump task embeddings + run the TPU ridge probe (checkerboard task)
  4. train SatCLIP contrastively for a few steps on a device mesh

Usage:  python examples/quickstart.py  [--steps N]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import range_tpu
    from range_tpu.bank.build import SyntheticPairedData, create_database
    from range_tpu.models.satmae import SatMaeEncoder
    from range_tpu.models.vit import ViTConfig, apply_vit, init_vit

    print(f"devices: {jax.devices()}")

    # -- 1. bank construction ------------------------------------------------
    sat_cfg = ViTConfig(image_resolution=256, patch_size=64, width=64, layers=1,
                        heads=2, in_channels=13, output_dim=256)
    mae_cfg = ViTConfig(image_resolution=224, patch_size=56, width=1024, layers=1,
                        heads=4, in_channels=3, output_dim=0, pool="mean",
                        quick_gelu=False, use_ln_pre=False, patch_bias=True)
    sat_params = init_vit(jax.random.PRNGKey(0), sat_cfg)
    mae = SatMaeEncoder(mae_cfg)
    mae_params = mae.init(jax.random.PRNGKey(1))
    bank = create_database(
        lambda p, x: mae.apply(p, x), mae_params,
        lambda p, x: apply_vit(p, x, sat_cfg), sat_params,
        SyntheticPairedData(n=512, batch_size=64),
    )
    print(f"bank: {int(bank.n_valid)} rows, keys {bank.key_dim}-d, "
          f"values {bank.value_dim}-d")

    # -- 2. RANGE+ inference --------------------------------------------------
    with tempfile.TemporaryDirectory() as tmp:
        db_path = os.path.join(tmp, "range_db.npz")
        bank.save_npz(db_path)  # reference npz schema
        model = range_tpu.load_model("RANGE+", db_path=db_path, beta=0.5,
                                     chunk=1024)
        rng = np.random.default_rng(0)
        coords = np.stack([rng.uniform(-180, 180, 4096),
                           rng.uniform(-90, 90, 4096)], 1)
        emb = np.asarray(model(coords))
        print(f"RANGE+ embeddings: {emb.shape} "
            f"(= {bank.value_dim} retrieved + 256 neural field)")

        # the measured serving bundle (hier retrieval + all round-3
        # levers; see api.SERVING_PROFILES / PERF.md) — one kwarg:
        fast = range_tpu.load_model("RANGE+", db_path=db_path, beta=0.5,
                                    chunk=1024, profile="flagship",
                                    hier_bn=128, gsz_geo=16)  # tiny-bank
        emb_fast = np.asarray(fast(coords))
        rel = (np.abs(emb_fast - emb)
               / np.maximum(np.abs(emb), 1e-1)).mean()
        print(f"flagship profile embeddings: {emb_fast.shape} "
              f"(feature relerr vs exact {rel:.3f})")

        # -- 3. downstream probe ---------------------------------------------
        from range_tpu.data.tasks import get_dataset
        from range_tpu.eval.embed import encode_task
        from range_tpu.eval.probe import evaluate_arrays

        train, evalu, _ = get_dataset("checker_64")
        sh = range_tpu.load_model("Theory")
        acc = evaluate_arrays(
            encode_task(sh, train, 2048), train.labels,
            encode_task(sh, evalu, 2048), evalu.labels, "checker_64")
        print(f"checkerboard probe accuracy (Theory encoder): {acc:.3f}")

    # -- 4. a few SatCLIP training steps over the mesh -----------------------
    from range_tpu.models.satclip import SatClipLocationConfig
    from range_tpu.parallel.mesh import make_mesh
    from range_tpu.train import satclip as tr

    model = tr.SatClipModel(tr.SatClipConfig(
        vision=ViTConfig(image_resolution=32, patch_size=8, width=64, layers=2,
                         heads=4, in_channels=4, output_dim=32),
        location=SatClipLocationConfig(embed_dim=32, legendre_polys=10,
                                       capacity=64, num_hidden_layers=2),
    ))
    params = model.init(jax.random.PRNGKey(0))
    opt = tr.make_optimizer(1e-3)
    mesh = make_mesh((len(jax.devices()), 1), ("data", "model"))
    step, place_params, place_batch = tr.make_sharded_train_step(model, opt, mesh)
    params = place_params(params)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    b = 8 * len(jax.devices())
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        batch = place_batch({
            "image": jnp.asarray(rng.standard_normal((b, 4, 32, 32)), jnp.float32),
            "point": jnp.asarray(np.stack([rng.uniform(-180, 180, b),
                                           rng.uniform(-90, 90, b)], 1),
                                 jnp.float32),
        })
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, sub)
        print(f"satclip train step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
