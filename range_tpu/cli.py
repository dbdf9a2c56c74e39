"""Eval CLI: save embeddings / evaluate precomputed npz dumps.

Counterpart of the reference driver (`range/range.py:281-307` __main__ +
`get_args` at :32-59): select a location model and a task, either dump
embeddings (--eval_type save_embeddings) or run the ridge probe on saved
dumps (--eval_type evaluate_npz).

Usage:
  python -m range_tpu --location_model_name RANGE+ --task_name checker_300 \
      --eval_type save_embeddings --range_db synthetic:20000
  python -m range_tpu --location_model_name RANGE+ --task_name checker_300 \
      --eval_type evaluate_npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="range_tpu embedding eval driver")
    p.add_argument("--location_model_name", type=str, default="SatCLIP")
    p.add_argument("--range_db", type=str, default=None,
                   help="RANGE database npz path or 'synthetic:N'")
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--beta", type=float, default=0.5)
    p.add_argument("--profile", type=str, default=None,
                   help="serving profile for RANGE models "
                        "(api.SERVING_PROFILES: exact | flagship | turbo)")
    p.add_argument("--task_name", type=str, default="biome")
    p.add_argument("--eval_dir", type=str, default=".")
    p.add_argument("--batch_size", type=int, default=5000)
    p.add_argument("--embeddings_dir", type=str, default="./saved_embeddings")
    p.add_argument("--eval_type", type=str, default="evaluate_npz",
                   choices=["save_embeddings", "evaluate_npz"])
    p.add_argument("--probe_backend", type=str, default="tpu",
                   choices=["tpu", "sklearn"])
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from .data.tasks import get_dataset
    from .eval.probe import evaluate_npz

    if args.eval_type == "save_embeddings":
        from .api import load_model
        from .eval.embed import save_embeddings

        kwargs = {}
        if "RANGE" in args.location_model_name:
            kwargs["db_path"] = args.range_db
            kwargs["beta"] = args.beta
        # profiles are RANGE-serving bundles; other encoders ignore them
        prof = args.profile if "RANGE" in args.location_model_name else None
        enc = load_model(args.location_model_name, profile=prof,
                         pretrained_path=args.pretrained_path, **kwargs)
        train, val, n_cls = get_dataset(args.task_name, args.eval_dir,
                                        seed=args.seed)
        print("Saving npz files for embeddings...")
        paths = save_embeddings(enc, train, val, args.embeddings_dir,
                                args.location_model_name, args.task_name,
                                batch_size=args.batch_size)
        for split, path in paths.items():
            print(f"File saved to {path}")
        return 0

    print("Evaluating embeddings from precomputed npz files")
    acc = evaluate_npz(args.embeddings_dir, args.location_model_name,
                       args.task_name, backend=args.probe_backend)
    acc = float(np.round(acc, 3))
    print(f"Accuracy: {acc}")
    sys.stderr.write(f"Accuracy: {acc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
