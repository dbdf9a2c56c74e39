"""Offline hier-bank prep CLI: build the serving cache ahead of time.

    python -m range_tpu.build_hier range_db.npz --out hier_cache.npz \
        --profile flagship [--shards 8] [--force]

Bank prep (geographic + key-space k-means, operand packing, low-rank /
residual factorizations) costs minutes at 100k+ rows — the dominant term of
a cold serving start (BENCH_r03 recorded 307.7 s for a fresh 100k flagship
build).  Running this CLI once lets every serving process start in seconds:
it goes through the same `prepare_hier_bank` entry point `load_model` uses,
so the stored build signature is guaranteed to match a `load_model(...,
profile=<same>, hier_cache=<out>)` request (signature mismatch = rebuild,
never a silently stale serve).

Reference context: the RANGE bank itself is an offline artifact
(`/root/reference/range/generate_db.py:188-215`, `Readme.md:42-51`); this
CLI is the TPU-serving analogue for the retrieval-acceleration operands.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Optional, Sequence

# build_hier_bank params a profile may carry (api kwarg name -> build kwarg)
_PROFILE_BUILD_KEYS = {
    "hier_bn": "bn", "gsz_sem": "gsz_sem", "gsz_geo": "gsz_geo",
    "gsz_super": "gsz_super", "tier": "tier", "group_by": "group_by",
    "group_value_weight": "group_value_weight", "lr_rank": "lr_rank",
    "lr_geo": "lr_geo", "res_rank": "res_rank", "topk_gsz": "topk_gsz",
    "topk_lr": "topk_lr", "tail_super": "tail_super", "sel_lr": "sel_lr",
}


def build_kwargs_from_profile(profile: Optional[str]) -> dict:
    """The build_hier_bank kwargs a `load_model(profile=...)` call would
    use (serving-only entries like k_tiles/tower_matmul are dropped)."""
    from .api import SERVING_PROFILES

    if profile is None:
        return {}
    try:
        entries = SERVING_PROFILES[profile]
    except KeyError:
        raise SystemExit(
            f"unknown profile {profile!r}; available: "
            f"{sorted(SERVING_PROFILES)}") from None
    if entries.get("retrieval", "dense") != "hier":
        raise SystemExit(
            f"profile {profile!r} serves retrieval="
            f"{entries.get('retrieval', 'dense')!r} — nothing to prebuild "
            f"(only hier profiles have a bank-prep stage)")
    return {_PROFILE_BUILD_KEYS[k]: v for k, v in entries.items()
            if k in _PROFILE_BUILD_KEYS}


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(
        description="Prebuild the hier serving cache for a retrieval bank")
    ap.add_argument("bank", help="range_db npz path, or synthetic:N / "
                                 "informative:N for generated banks")
    ap.add_argument("--out", required=True,
                    help="output cache npz (pass the same path to "
                         "load_model(..., hier_cache=...) or serve "
                         "--hier-cache)")
    ap.add_argument("--profile", default="flagship",
                    help="serving profile whose build params to use "
                         "(api.SERVING_PROFILES; explicit flags win)")
    ap.add_argument("--shards", type=int, default=1,
                    help="mesh bank-axis size the cache is built for "
                         "(must match serving's mesh; 1 = single chip)")
    ap.add_argument("--value-quant", default=None, choices=["int8"],
                    help="quantize bank values before the build (must "
                         "match serving's value_quant)")
    ap.add_argument("--chunk", type=int, default=4096,
                    help="bank row padding (load_model's chunk default)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--force", action="store_true",
                    help="rebuild even if the existing cache matches")
    ap.add_argument("--host-stage", default=None,
                    choices=["auto", "on", "off"],
                    help="stage the build through host RAM (1M+-row banks; "
                         "default auto: on above 500k rows)")
    # explicit build-param overrides (default: the profile's values)
    ap.add_argument("--bn", type=int, default=None)
    ap.add_argument("--gsz-sem", type=int, default=None)
    ap.add_argument("--gsz-geo", type=int, default=None)
    ap.add_argument("--gsz-super", type=int, default=None)
    ap.add_argument("--tier", default=None, choices=["fast", "high", "exact"])
    ap.add_argument("--group-by", default=None, choices=["key", "key_value"])
    ap.add_argument("--lr-rank", type=int, default=None)
    ap.add_argument("--lr-geo", type=int, default=None)
    ap.add_argument("--res-rank", type=int, default=None)
    ap.add_argument("--topk-gsz", type=int, default=None)
    ap.add_argument("--topk-lr", type=int, default=None)
    ap.add_argument("--tail-super", type=int, default=None)
    ap.add_argument("--sel-lr", type=int, default=None)
    args = ap.parse_args(argv)

    from .api import _as_bank
    from .ops.retrieval_hier import (hier_build_signature, peek_hier_build,
                                     prepare_hier_bank)

    kw = build_kwargs_from_profile(args.profile)
    for flag, key in (("bn", "bn"), ("gsz_sem", "gsz_sem"),
                      ("gsz_geo", "gsz_geo"), ("gsz_super", "gsz_super"),
                      ("tier", "tier"), ("group_by", "group_by"),
                      ("lr_rank", "lr_rank"), ("lr_geo", "lr_geo"),
                      ("res_rank", "res_rank"),
                      ("topk_gsz", "topk_gsz"), ("topk_lr", "topk_lr"),
                      ("tail_super", "tail_super"), ("sel_lr", "sel_lr")):
        v = getattr(args, flag)
        if v is not None:
            kw[key] = v

    t0 = time.time()
    bank = _as_bank(args.bank, args.chunk)
    if args.value_quant == "int8":
        from .bank.bank import quantize_values

        bank = quantize_values(bank)
    t_load = time.time() - t0
    print(f"bank: {bank.num_rows} rows ({int(bank.n_valid)} valid), "
          f"keys {bank.key_dim}-d, values {bank.values.shape[1]}-d "
          f"[loaded in {t_load:.1f}s]")

    sig = hier_build_signature(
        bank, bn=kw.get("bn", 512), gsz_sem=kw.get("gsz_sem", 8),
        gsz_geo=kw.get("gsz_geo", 64), gsz_super=kw.get("gsz_super", 0),
        tier=kw.get("tier", "fast"), seed=args.seed, shards=args.shards,
        group_by=kw.get("group_by", "key_value"),
        group_value_weight=kw.get("group_value_weight", 1.0),
        lr_rank=kw.get("lr_rank") or 0, lr_geo=kw.get("lr_geo") or 0,
        res_rank=kw.get("res_rank") or 0,
        topk_gsz=kw.get("topk_gsz", 0), topk_lr=kw.get("topk_lr", 0),
        tail_super=kw.get("tail_super", 0), sel_lr=kw.get("sel_lr", 0))
    import os

    if os.path.exists(args.out) and not args.force:
        if peek_hier_build(args.out) == sig:
            print(f"{args.out} is already up to date (signature match) — "
                  f"nothing to do.  Use --force to rebuild.")
            return

    t0 = time.time()
    hs = {"auto": None, "on": True, "off": False}[args.host_stage or "auto"]
    hb = prepare_hier_bank(bank, seed=args.seed, shards=args.shards,
                           cache_path=args.out, force=args.force,
                           host_stage=hs, **kw)
    t_build = time.time() - t0
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"built + saved {args.out} ({size_mb:.0f} MB) in {t_build:.1f}s: "
          f"{hb.t_real} tiles of bn={hb.bn} "
          f"(t_pad={hb.t_pad}, shards={args.shards})")
    print("signature:", json.dumps(sig))


if __name__ == "__main__":
    main()
