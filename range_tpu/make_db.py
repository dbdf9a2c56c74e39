"""Bank-construction CLI.

Counterpart of `python -m range.generate_db --to_do make_db`
(`range/generate_db.py:20-33,218-241`) — note the reference script bit-rotted
(broken relative imports at generate_db.py:15-18); this one runs.

Real data:    python -m range_tpu.make_db --data_dir <s2-100k root> \
                  --rgb_path <rgb dir> --satclip_ckpt <ckpt> --out_path db.npz
Synthetic:    python -m range_tpu.make_db --synthetic 1024 --out_path db.npz
(SatMAE weights are HF-hosted; without --satmae_ckpt a seeded random SatMAE
ViT-L is used — fine for pipeline validation, not for real banks.)
"""

from __future__ import annotations

import argparse


def get_args(argv=None):
    p = argparse.ArgumentParser(description="build a RANGE retrieval database")
    p.add_argument("--to_do", type=str, default="make_db", choices=["make_db"])
    p.add_argument("--data_dir", type=str, default=None,
                   help="S2-100K root (index.csv + images/)")
    p.add_argument("--rgb_path", type=str, default=None)
    p.add_argument("--satclip_ckpt", type=str, default=None,
                   help="SatCLIP .ckpt for the visual tower (keys)")
    p.add_argument("--satmae_ckpt", type=str, default=None,
                   help="SatMAE state-dict checkpoint (values); random if unset")
    p.add_argument("--out_path", type=str, default="range_db.npz")
    p.add_argument("--batch_size", type=int, default=200)
    p.add_argument("--synthetic", type=int, default=0,
                   help="build from N synthetic paired samples instead of data")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp

    from .bank.build import S2PairedDataset, SyntheticPairedData, create_database
    from .models.satmae import SatMaeEncoder, satmae_params_from_state_dict
    from .models.vit import ViTConfig, apply_vit, init_vit

    # values tower: SatMAE ViT-L raw (1024-d), generate_db.py:230
    mae = SatMaeEncoder()
    if args.satmae_ckpt:
        from .convert.torch_zip import load_torch_checkpoint

        sd = load_torch_checkpoint(args.satmae_ckpt)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        mae_params = satmae_params_from_state_dict(sd)
    else:
        print("no --satmae_ckpt: using seeded random SatMAE (pipeline check only)")
        mae_params = mae.init(jax.random.PRNGKey(1))

    # keys tower: SatCLIP visual (256-d), generate_db.py:231-234
    if args.satclip_ckpt:
        from .convert.satclip_ckpt import load_satclip_full

        model, params = load_satclip_full(args.satclip_ckpt)
        sat_cfg = model.config.vision
        sat_params = params["visual"]
    else:
        print("no --satclip_ckpt: using seeded random SatCLIP visual tower")
        sat_cfg = ViTConfig()
        sat_params = init_vit(jax.random.PRNGKey(0), sat_cfg)

    if args.synthetic:
        batches = SyntheticPairedData(n=args.synthetic, batch_size=args.batch_size)
    else:
        if not (args.data_dir and args.rgb_path):
            raise SystemExit("need --data_dir and --rgb_path (or --synthetic N)")
        batches = S2PairedDataset(args.data_dir, args.rgb_path).batches(
            args.batch_size)

    bank = create_database(
        lambda p, x: mae.apply(p, x), mae_params,
        lambda p, x: apply_vit(p, x, sat_cfg), sat_params,
        batches, out_path=args.out_path,
    )
    print(f"Database created and saved to {args.out_path} "
          f"({int(bank.n_valid)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
