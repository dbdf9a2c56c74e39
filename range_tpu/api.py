"""Public API: `load_model` factory + encoder registry.

Counterpart of `range/load_model.py:16-51` and the name-dispatch in
`range/range.py:69-203`, redesigned: a registry of builder functions keyed by
the reference model names, each returning a `GeoEncoder` — a thin wrapper
holding a *pure* apply function, its params pytree, and the static
`embedding_dim`.  The wrapped call is jitted once; coords go in as [B, 2]
(lon, lat) degrees and a device array [B, D] comes out (we do not reproduce
the reference's numpy-returning forward, range.py:222,240).

Unlike the reference, `pretrained_path=None` is allowed: parametric models
fall back to seeded random initialization (handy for benchmarks and tests on
machines without the HF artifacts); pass a real checkpoint for parity.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from .bank.bank import GeoBank
from .geometry import deg2rad, lonlat_deg_to_xyz
from .models.range_encoder import RangeConfig, RangeEncoder
from .models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from .ops.posenc import GridAndSphere, Theory, Wrap


class GeoEncoder:
    """name + pure apply + params + static embedding_dim, jit-wrapped.

    ``extra`` holds large non-trainable state (the retrieval bank) and is
    passed to the jitted function as an *argument* — capturing it as a trace
    constant would serialize hundreds of MB into the HLO (catastrophic on a
    tunneled TPU) and re-trace whenever it changes.
    """

    def __init__(self, name: str, apply_fn: Callable, params: Any,
                 embedding_dim: int, model: Any = None, extra: Any = None):
        self.name = name
        self._apply3 = apply_fn  # (params, coords[B,2] deg, extra) -> [B, D]
        self.params = params
        self.extra = extra
        self.embedding_dim = embedding_dim
        self.model = model
        self._jitted = jax.jit(apply_fn)

    def apply(self, params, coords, extra=None):
        """Pure forward (un-jitted)."""
        return self._apply3(params, coords, self.extra if extra is None else extra)

    def __call__(self, coords) -> jnp.ndarray:
        coords = jnp.asarray(coords)
        if coords.ndim != 2 or coords.shape[-1] != 2:
            raise ValueError(f"expected [B, 2] (lon, lat) degrees, got {coords.shape}")
        return self._jitted(self.params, coords, self.extra)

    # reference parity alias (`LocationEncoder.location_feature_dim`,
    # range.py:86,122,...)
    @property
    def location_feature_dim(self) -> int:
        return self.embedding_dim


_REGISTRY: Dict[str, Callable[..., GeoEncoder]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models():
    return sorted(_REGISTRY)


def _as_bank(db: Union[str, GeoBank, None], chunk: int) -> GeoBank:
    if db is None:
        raise ValueError("db_path is required for RANGE models "
                         "(a path to a range_db npz, a GeoBank, or 'synthetic:N')")
    if isinstance(db, GeoBank):
        return db
    if isinstance(db, str) and db.startswith("synthetic:"):
        return GeoBank.synthetic_device(0, int(db.split(":")[1]), pad_to=chunk)
    if isinstance(db, str) and db.startswith("informative:"):
        # spatially autocorrelated synthetic bank (keys = SatCLIP-tower
        # embeddings of the bank locations) — see GeoBank.synthetic_informative
        return GeoBank.synthetic_informative(0, int(db.split(":")[1]),
                                             pad_to=chunk)
    return GeoBank.from_npz(db, pad_to=chunk)


def _satclip_tower(pretrained_path: Optional[str], dtype, seed: int,
                   tower_matmul: Optional[str] = None):
    if tower_matmul not in (None, "bf16"):
        # only the exact string has an effect downstream — anything else
        # would silently serve the full-f32 tower
        raise ValueError(
            f"tower_matmul must be None or 'bf16', got {tower_matmul!r}")
    if pretrained_path:
        import dataclasses as _dc

        from .convert.satclip_ckpt import load_satclip_checkpoint

        encoder, params = load_satclip_checkpoint(pretrained_path, dtype=dtype)
        if tower_matmul:
            encoder.config = _dc.replace(encoder.config,
                                         fused_matmul_dtype=tower_matmul)
        return encoder, params
    encoder = SatClipLocationEncoder(SatClipLocationConfig(
        fused_matmul_dtype=tower_matmul))
    params = encoder.init(jax.random.PRNGKey(seed), dtype=dtype)
    return encoder, params


def _build_range(name: str, mode: str, pretrained_path, db_path, beta, *,
                 dtype=jnp.float32, seed: int = 0, chunk: int = 4096,
                 compute_dtype=jnp.float32, tier: str = "fast",
                 use_pallas: Optional[bool] = None,
                 value_quant: Optional[str] = None,
                 retrieval: str = "dense", k_tiles: int = 16,
                 m_tiles: Optional[int] = None, k_geo: int = 0,
                 hier_min_batch: int = 0,
                 j_sem: int = 2, j_geo: int = 2, hier_bm: int = 256,
                 hier_scan_bm: int = 0,
                 adaptive_frac: float = 0.0, adaptive_mult: int = 3,
                 hier_bn: int = 512, gsz_sem: int = 8, gsz_geo: int = 64,
                 gsz_super: int = 0, group_by: str = "key_value",
                 group_value_weight: float = 1.0,
                 lr_rank: Optional[int] = None,
                 lr_geo: Optional[int] = None,
                 res_rank: Optional[int] = None,
                 topk_gsz: int = 0, topk_lr: int = 0, tail_super: int = 0,
                 sel_lr: int = 0, m_corr: int = 0,
                 dedup: int = 0, k_union: Optional[int] = None,
                 tower_matmul: Optional[str] = None,
                 mesh=None, bank_axis: Optional[str] = None,
                 data_axis: Optional[str] = None, shard_bm: int = 512,
                 shard_bn: int = 1024,
                 **kw) -> GeoEncoder:
    hier_cache = kw.pop("hier_cache", None)
    if kw:
        # a typo'd knob (k_tile=32, lr_geO=...) would otherwise silently
        # serve a degraded configuration (VERDICT r4 #6)
        raise TypeError(
            f"load_model({name!r}): unknown keyword argument(s) "
            f"{sorted(kw)}; valid knobs: {sorted(_RANGE_KWARGS)}")
    tower, params = _satclip_tower(pretrained_path, dtype, seed,
                                   tower_matmul=tower_matmul)
    bank = _as_bank(db_path, chunk)
    if value_quant == "int8":
        # per-row int8 values + scale: ~half the bank HBM footprint, taken by
        # the fused kernel automatically (see bank.quantize_values / PERF.md)
        from .bank.bank import quantize_values

        bank = quantize_values(bank)
    elif value_quant is not None:
        raise ValueError(f"value_quant must be None or 'int8', got {value_quant!r}")
    if retrieval == "hier":
        # two-stage approximate serving (ops/retrieval_hier.py): cluster +
        # prepack the bank once at load; with a mesh, build for and shard
        # over its bank axis (parallel/sharded.shard_hier_bank).
        # `hier_cache=<path>` persists the prepacked operands — bank prep
        # (k-means + packing) costs minutes; serving restarts then load in
        # seconds
        from .ops.retrieval_hier import prepare_hier_bank

        n_shards = 1
        if mesh is not None:
            bank_axis = bank_axis or mesh.axis_names[-1]
            n_shards = mesh.shape[bank_axis]
        # prepare_hier_bank owns the signature-validated disk cache (shared
        # with the offline CLI `python -m range_tpu.build_hier`, so a
        # CLI-prepared cache hits here by construction)
        bank = prepare_hier_bank(bank, bn=hier_bn, gsz_sem=gsz_sem,
                                 gsz_geo=gsz_geo, gsz_super=gsz_super,
                                 group_by=group_by,
                                 group_value_weight=group_value_weight,
                                 lr_rank=lr_rank, lr_geo=lr_geo,
                                 res_rank=res_rank,
                                 topk_gsz=topk_gsz, topk_lr=topk_lr,
                                 tail_super=tail_super, sel_lr=sel_lr,
                                 tier=tier, seed=seed,
                                 shards=n_shards,
                                 cache_path=hier_cache)
        if mesh is not None:
            from .parallel.sharded import shard_hier_bank

            bank = shard_hier_bank(bank, mesh, axis=bank_axis)
    elif retrieval != "dense":
        raise ValueError(f"retrieval must be 'dense' or 'hier', got {retrieval!r}")
    if mesh is not None and retrieval == "dense":
        # one-line multi-chip serving: rows spread over the mesh's bank
        # axis; apply() routes to parallel/sharded.py (exact psum combine)
        from .parallel.sharded import shard_bank

        bank_axis = bank_axis or mesh.axis_names[-1]
        if mesh.shape[bank_axis] > 1:
            assert bank.num_rows % (mesh.shape[bank_axis] * shard_bn) == 0, (
                f"bank rows {bank.num_rows} must divide evenly into "
                f"{mesh.shape[bank_axis]} shards of {shard_bn}-row tiles; "
                f"re-pad with chunk/pad_to accordingly")
        bank = shard_bank(bank, mesh, axis=bank_axis)
    cfg = RangeConfig(mode=mode, beta=beta, chunk=chunk,
                      compute_dtype=compute_dtype, tier=tier,
                      use_pallas=use_pallas, retrieval=retrieval,
                      k_tiles=k_tiles, m_tiles=m_tiles, k_geo=k_geo,
                      hier_min_batch=hier_min_batch,
                      j_sem=j_sem, j_geo=j_geo,
                      hier_bm=hier_bm, hier_scan_bm=hier_scan_bm,
                      adaptive_frac=adaptive_frac,
                      adaptive_mult=adaptive_mult, m_corr=m_corr,
                      dedup=dedup, k_union=k_union, mesh=mesh,
                      bank_axis=bank_axis or "bank", data_axis=data_axis,
                      shard_bm=shard_bm, shard_bn=shard_bn)
    enc = RangeEncoder(tower, bank, cfg)

    def apply_fn(p, c, extra):
        return enc.apply(p, c, bank=extra)

    return GeoEncoder(name, apply_fn, params, enc.embedding_dim, model=enc,
                      extra=bank)


# the validated knob set for RANGE/RANGE+: _build_range's named kwargs plus
# the entries handled before/around it
_RANGE_KWARGS = sorted(
    [p.name for p in inspect.signature(_build_range).parameters.values()
     if p.kind == p.KEYWORD_ONLY] + ["db_path", "beta", "hier_cache"])


@register("RANGE")
def _range(pretrained_path=None, db_path=None, beta=0.5, **kw):
    return _build_range("RANGE", "range", pretrained_path, db_path, beta, **kw)


@register("RANGE+")
def _range_plus(pretrained_path=None, db_path=None, beta=0.5, **kw):
    return _build_range("RANGE+", "range+", pretrained_path, db_path, beta, **kw)


def _reject_unknown(model_name: str, kw: dict, valid=()):
    """Raise on typo'd load_model kwargs instead of silently ignoring them
    (VERDICT r4 #6).  `valid` lists this builder's accepted knobs for the
    error message (its explicit signature params are always accepted —
    they never reach the **kw catch-all)."""
    if kw:
        raise TypeError(
            f"load_model({model_name!r}): unknown keyword argument(s) "
            f"{sorted(kw)}; this model accepts: "
            f"{sorted(set(valid) | {'pretrained_path'})}")


@register("SatCLIP")
def _satclip(pretrained_path=None, dtype=jnp.float32, seed: int = 0,
             tower_matmul=None, **kw):
    _reject_unknown("SatCLIP", kw, ("dtype", "seed", "tower_matmul"))
    tower, params = _satclip_tower(pretrained_path, dtype, seed,
                                   tower_matmul=tower_matmul)
    return GeoEncoder("SatCLIP", lambda p, c, e: tower.apply(p, c), params,
                      tower.embedding_dim, model=tower)


@register("Direct")
def _direct(pretrained_path=None, **kw):
    # range.py:262-264: deg -> rad, identity net (NOT the PE direct.py which
    # also subtracts pi).
    _reject_unknown("Direct", kw)
    return GeoEncoder("Direct", lambda p, c, e: deg2rad(c), None, 2)


@register("Cartesian_3D")
def _cartesian(pretrained_path=None, **kw):
    # range.py:265-268
    _reject_unknown("Cartesian_3D", kw)
    return GeoEncoder("Cartesian_3D", lambda p, c, e: lonlat_deg_to_xyz(c), None, 3)


@register("Theory")
def _theory(pretrained_path=None, **kw):
    # range.py:165-168: Theory(frequency_num=32, min_radius=1) on raw degrees.
    _reject_unknown("Theory", kw)
    pe = Theory(frequency_num=32, min_radius=1.0)
    return GeoEncoder("Theory", lambda p, c, e: pe(c), None, pe.embedding_dim)


@register("Wrap")
def _wrap(pretrained_path=None, **kw):
    # range.py:171-174
    _reject_unknown("Wrap", kw)
    pe = Wrap()
    return GeoEncoder("Wrap", lambda p, c, e: pe(c), None, pe.embedding_dim)


@register("GeoCLIP")
def _geoclip(pretrained_path=None, dtype=jnp.float32, seed: int = 0, **kw):
    # input flipped to (lat, lon) before the model, as range.py:248
    _reject_unknown("GeoCLIP", kw, ("dtype", "seed"))
    from .models.geoclip import GeoClipLocationEncoder, geoclip_params_from_state_dict

    enc = GeoClipLocationEncoder()
    if pretrained_path:
        from .convert.torch_zip import load_torch_checkpoint

        sd = load_torch_checkpoint(pretrained_path)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = geoclip_params_from_state_dict(sd, dtype)
    else:
        params = enc.init(jax.random.PRNGKey(seed), dtype=dtype)
    return GeoEncoder("GeoCLIP", lambda p, c, e: enc.apply(p, c[:, [1, 0]]),
                      params, enc.embedding_dim, model=enc)


@register("TaxaBind")
def _taxabind(pretrained_path=None, dtype=jnp.float32, seed: int = 1, **kw):
    # GeoCLIP architecture with a patched checkpoint (range.py:133-138), same
    # (lat, lon) flip (range.py:258-260)
    g = _geoclip(pretrained_path=pretrained_path, dtype=dtype, seed=seed, **kw)
    return GeoEncoder("TaxaBind", g._apply3, g.params, g.embedding_dim, model=g.model)


def _csp(name: str, pretrained_path, dtype, seed, **kw):
    _reject_unknown(name, kw, ("dtype", "seed"))
    from .models.csp import CspConfig, CspLocationEncoder, load_csp

    if pretrained_path:
        enc, params = load_csp(pretrained_path, dtype=dtype)
    else:
        enc = CspLocationEncoder(CspConfig())
        params = enc.init(jax.random.PRNGKey(seed), dtype=dtype)
    # forward(coords, return_feats=True), raw degrees (range.py:251-252)
    return GeoEncoder(name, lambda p, c, e: enc.apply(p, c, return_feats=True),
                      params, enc.embedding_dim, model=enc)


@register("CSP")
def _csp_fmow(pretrained_path=None, dtype=jnp.float32, seed: int = 2, **kw):
    return _csp("CSP", pretrained_path, dtype, seed, **kw)


@register("CSP_INat")
def _csp_inat(pretrained_path=None, dtype=jnp.float32, seed: int = 3, **kw):
    return _csp("CSP_INat", pretrained_path, dtype, seed, **kw)


@register("SINR")
def _sinr(pretrained_path=None, dtype=jnp.float32, seed: int = 4, **kw):
    _reject_unknown("SINR", kw, ("dtype", "seed"))
    from .models.sinr import SinrLocationEncoder, sinr_params_from_state_dict

    enc = SinrLocationEncoder()
    if pretrained_path:
        from .convert.torch_zip import load_torch_checkpoint

        sd = load_torch_checkpoint(pretrained_path)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = sinr_params_from_state_dict(sd, dtype)
    else:
        params = enc.init(jax.random.PRNGKey(seed), dtype=dtype)
    return GeoEncoder("SINR", lambda p, c, e: enc.apply(p, c), params,
                      enc.embedding_dim, model=enc)


# sphere2vec presets: frequency_num/min_radius from the reference tuned
# hyperparameter database (`sphere2vec/hparams.yaml`, inat2018 *-linear rows,
# read by `get_sphere2vec`, sphere2vec.py:250-276).  Note the reference passes
# its *function default* max_radius=0.01 for every variant except grid — we
# reproduce that faithfully.
_S2VEC_PRESETS = {
    "grid": dict(frequency_num=48, min_radius=1.0, max_radius=360.0),
    "spherec": dict(frequency_num=48, min_radius=1.0, max_radius=0.01),
    "spherecplus": dict(frequency_num=16, min_radius=1.0, max_radius=0.01),
    "spherem": dict(frequency_num=48, min_radius=1.0, max_radius=0.01),
    "spheremplus": dict(frequency_num=32, min_radius=1.0, max_radius=0.01),
}


def sphere2vec_hparams(dataset: str = "inat2018", encoder: str = "spherec",
                       head: str = "linear", yaml_path: Optional[str] = None
                       ) -> dict:
    """Tuned sphere2vec hyperparameters.

    The reference ships a per-dataset yaml database
    (`sphere2vec/hparams.yaml`, read by `get_sphere2vec`, sphere2vec.py:255);
    the full table (4 datasets x encoder x head: frequency_num/min_radius +
    tuned lr/wd) is vendored as config data at
    `range_tpu/data/sphere2vec_hparams.yaml` and read by default.  Pass
    `yaml_path` to read a different file."""
    import yaml

    if yaml_path is None:
        import os

        yaml_path = os.path.join(os.path.dirname(__file__), "data",
                                 "sphere2vec_hparams.yaml")
    with open(yaml_path) as f:
        db = yaml.safe_load(f)
    try:
        return dict(db[dataset][f"{encoder}-{head}"])
    except KeyError:
        avail = {k: sorted(x for x in v if x != "dataset")
                 for k, v in db.items()}
        raise KeyError(
            f"no tuned hparams for {dataset}/{encoder}-{head}; available: "
            f"{avail}") from None


def _make_s2vec(variant: str):
    @register(f"s2vec_{variant}")
    def _s2vec(pretrained_path=None, **kw):
        _reject_unknown(f"s2vec_{variant}", kw)
        pe = GridAndSphere(name=variant, **_S2VEC_PRESETS[variant])
        return GeoEncoder(f"s2vec_{variant}", lambda p, c, e: pe(c), None,
                          pe.embedding_dim)

    return _s2vec


for _v in _S2VEC_PRESETS:
    _make_s2vec(_v)


# Named serving profiles: the measured-kwarg bundles deployments should
# reach for instead of hand-copying tuning flags.  Explicit kwargs win
# over the profile's entries.
SERVING_PROFILES: Dict[str, Dict[str, Any]] = {
    # exact dense retrieval (the reference semantics; ~350k q/s at 100k
    # rows — bank-stream-bound at any batch size)
    "exact": {"retrieval": "dense"},
    # the flagship: ONE config meeting throughput + top-k recall >= 0.999
    # + downstream probe parity (PERF.md rounds 3-4; bench.py runs exactly
    # this).  Round 4 added lr_geo=384 (low-rank geo tail: retrieval 4.48
    # -> 3.88 ms measured at flat fidelity; active-truncation probe gap
    # -0.0012 on the Dv=1024 bank, RESULTS.md PROFILES table)
    "flagship": {
        "retrieval": "hier", "lr_rank": 256, "lr_geo": 384, "res_rank": 128,
        "gsz_sem": 16, "topk_gsz": 8, "k_tiles": 32, "j_sem": 3,
        "k_geo": 16, "hier_scan_bm": 512, "tower_matmul": "bf16",
    },
    # maximum-throughput mode — measured bars (round 4, B=10,240):
    # features 3.66M q/s at relerr mean 6.9% (small batches auto-widen to
    # flagship-grade relerr), topk K=24 recall@1 0.9926, active-truncation
    # probe gap -0.0094..-0.0106.  Use flagship when the probe bar matters.
    "turbo": {
        "retrieval": "hier", "lr_rank": 256, "lr_geo": 384, "res_rank": 128,
        "gsz_sem": 16, "topk_gsz": 8, "k_tiles": 8, "j_sem": 2,
        "k_geo": 4, "hier_scan_bm": 512, "tower_matmul": "bf16",
    },
}


def load_model(model_name: str = "RANGE+", pretrained_path: Optional[str] = None,
               device=None, profile: Optional[str] = None,
               **kwargs) -> GeoEncoder:
    """Load a location encoder by reference name.

    Mirrors `range/load_model.py:16-51`.  kwargs: ``db_path`` (required for
    RANGE/RANGE+; npz path, GeoBank, or 'synthetic:N'), ``beta`` (default
    0.5), plus framework extras (dtype, seed, chunk, compute_dtype, mesh).

    ``profile`` selects a named serving-kwarg bundle (SERVING_PROFILES:
    'exact', 'flagship', 'turbo'); explicit kwargs override its entries.

    ``device`` accepts a jax.Device to place params on (default: first
    device); sharded placement is handled by `parallel/` helpers instead.
    """
    if model_name not in _REGISTRY:
        raise NotImplementedError(
            f"{model_name} not implemented; available: {list_models()}"
        )
    if profile is not None:
        try:
            base = SERVING_PROFILES[profile]
        except KeyError:
            raise ValueError(
                f"unknown profile {profile!r}; available: "
                f"{sorted(SERVING_PROFILES)}") from None
        kwargs = {**base, **kwargs}
    if "RANGE" in model_name and "db_path" not in kwargs:
        raise AssertionError("db_path is required for RANGE model.")
    enc = _REGISTRY[model_name](pretrained_path=pretrained_path, **kwargs)
    if device is not None and enc.params is not None:
        enc.params = jax.device_put(enc.params, device)
    return enc
