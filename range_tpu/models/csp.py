"""CSP location encoders (inference) — pure jnp.

Counterpart of the vendored CSP stack the RANGE dispatcher uses through
`get_csp` (`csp/load_csp.py:9-31` -> `csp/main/utils.py:694-728` get_model ->
`get_spa_encoder` utils.py:525-692 + `csp/main/models.py:116-222`).  The
torch version round-trips every forward through host numpy
(`models.py:143-147`); here the whole encoder is one jittable function.

Pieces:
  * spatial PEs: gridcell (SpatialRelationEncoder.py:51-200), theory
    (:454-600), naive (:906-965), aodha-fft (:1259-1352) — all share the
    geometric frequency ladder of `common._cal_freq_list` semantics;
  * MultiLayerFeedForwardNN (`module.py:136-231`): hidden layers =
    linear + activation + dropout (+ optional skip when dims match,
    + optional LayerNorm), last layer = linear + activation + dropout only;
  * CspLocationEncoder (`models.py:116-173`): spa_enc -> loc_emb with a
    bias-free class head (+ user head); ``return_feats`` semantics match the
    RANGE call site (`range/range.py:252`).

Checkpoints: `.pth.tar` dicts with {'params', 'state_dict'}
(`load_csp.py:10-29`) convert via `csp_params_from_checkpoint`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.posenc import cal_freq_list


def coord_normalize(coords: jnp.ndarray, extent=(-180, 180, -90, 90),
                    do_global: bool = False) -> jnp.ndarray:
    """Mirrors `csp/main/data_utils.py:96-127`."""
    x, y = coords[..., 0], coords[..., 1]
    if do_global:
        x = x / 180.0
        y = y / 90.0
    else:
        x = ((x - extent[0]) / (extent[1] - extent[0])) * 2 - 1
        y = ((y - extent[2]) / (extent[3] - extent[2])) * 2 - 1
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# spatial PEs (stateless)
# ---------------------------------------------------------------------------


def gridcell_embed(coords: jnp.ndarray, frequency_num: int, max_radius: float,
                   min_radius: float, freq_init: str = "geometric") -> jnp.ndarray:
    """[B,2] raw coords -> [B, 4*freq].  Layout: coord-major, then frequency,
    then (sin, cos) — the reference's duplicated trailing axis with 0::2 sin
    (`SpatialRelationEncoder.py:127-170`)."""
    freqs = jnp.asarray(cal_freq_list(freq_init, frequency_num, max_radius, min_radius),
                        coords.dtype)
    scaled = coords[:, :, None] * freqs[None, None, :]  # [B, 2, F]
    out = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)  # [B,2,F,2]
    return out.reshape(coords.shape[0], -1)


def theory_embed(coords: jnp.ndarray, frequency_num: int, max_radius: float,
                 min_radius: float, freq_init: str = "geometric") -> jnp.ndarray:
    """[B,2] -> [B, 6*freq]: three 120-degree unit-vector projections, sin on
    even flat positions (`SpatialRelationEncoder.py:454-560`)."""
    u = jnp.asarray(
        np.array([
            [1.0, 0.0], [1.0, 0.0],
            [-0.5, math.sqrt(3) / 2], [-0.5, math.sqrt(3) / 2],
            [-0.5, -math.sqrt(3) / 2], [-0.5, -math.sqrt(3) / 2],
        ]).T,
        coords.dtype,
    )
    freqs = jnp.asarray(cal_freq_list(freq_init, frequency_num, max_radius, min_radius),
                        coords.dtype)
    ang = (coords @ u)[:, None, :] * freqs[None, :, None]  # [B, F, 6]
    flat = ang.reshape(ang.shape[0], -1)
    idx = jnp.arange(flat.shape[-1])
    return jnp.where(idx % 2 == 0, jnp.sin(flat), jnp.cos(flat))


def naive_embed(coords: jnp.ndarray, extent=(-180, 180, -90, 90)) -> jnp.ndarray:
    """min-max normalized raw coords (`SpatialRelationEncoder.py:906-965`)."""
    return coord_normalize(coords, extent)


def aodha_embed(coords: jnp.ndarray, extent=(-180, 180, -90, 90),
                do_global: bool = True) -> jnp.ndarray:
    """[sin(pi x), sin(pi y), cos(pi x), cos(pi y)] of normalized coords
    (`SpatialRelationEncoder.py:1300-1330`: sin block then cos block)."""
    c = coord_normalize(coords, extent, do_global)
    return jnp.concatenate([jnp.sin(math.pi * c), jnp.cos(math.pi * c)], axis=-1)


def rff_embed(coords: jnp.ndarray, dirvec: jnp.ndarray, shift: jnp.ndarray,
              extent=(-180, 180, -90, 90)) -> jnp.ndarray:
    """Random Fourier features (Rahimi & Recht): cos(x W + b) sqrt(2/F) over
    min-max normalized coords (`SpatialRelationEncoder.py:1155-1254`).  The
    direction/shift vectors are frozen parameters stored in checkpoints."""
    c = coord_normalize(coords, extent)
    F = dirvec.shape[1]
    return jnp.cos(c @ dirvec + shift) * math.sqrt(2.0 / F)


def hexagon_embed(coords: jnp.ndarray, frequency_num: int,
                  max_radius: float) -> jnp.ndarray:
    """Hexagon grid-cell PE (`SpatialRelationEncoder.py:355-446`): per coord
    and frequency, three sines phase-shifted by 120 degrees; frequencies are
    max_radius^{-f/(F-1)} (the class's own ladder, not _cal_freq_list).
    [B, 2] -> [B, 6*F] in (coord, freq, phase) order."""
    f = jnp.arange(frequency_num, dtype=coords.dtype)
    freqs = max_radius ** (-f / (frequency_num - 1))
    ang = coords[:, :, None] * freqs[None, None, :]  # [B, 2, F]
    phases = jnp.asarray([0.0, 2 * math.pi / 3, 4 * math.pi / 3], coords.dtype)
    out = jnp.sin(ang[..., None] + phases)  # [B, 2, F, 3]
    return out.reshape(coords.shape[0], -1)


def rbf_embed(coords: jnp.ndarray, anchors: jnp.ndarray,
              kernel_size: float) -> jnp.ndarray:
    """RBF anchor-point PE (`SpatialRelationEncoder.py:974-1140`, 'global'
    model): exp(-|x - a|^2 / (2 sigma^2)) against anchor locations sampled
    from the training set.  Anchors live in the param tree (the reference
    keeps them as a module attribute, so they are NOT in its checkpoints —
    reproducibility requires re-supplying train_locs there; here they
    checkpoint with everything else)."""
    d2 = jnp.sum((coords[:, None, :] - anchors[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-d2 / (2.0 * kernel_size ** 2))


# gridcellnorm/theorynorm share the plain encoders' math: the reference
# "Norm" variants' normalization line executes after the embedding is built
# (dead code, SpatialRelationEncoder.py:305-306), so they are exact aliases.
_PE_DIMS = {
    "gridcell": lambda f: 4 * f,
    "gridcellnorm": lambda f: 4 * f,
    "theory": lambda f: 6 * f,
    "theorynorm": lambda f: 6 * f,
    "naive": lambda f: 2,
    "geo_net_fft": lambda f: 4,
    "rff": lambda f: f,
    "hexagridcell": lambda f: 6 * f,
    "rbf": lambda f: f,  # f doubles as num_rbf_anchor_pts
    "theorydiag": lambda f: 6 * f,
}


# ---------------------------------------------------------------------------
# FFN
# ---------------------------------------------------------------------------

_ACTS = {
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


@dataclasses.dataclass(frozen=True)
class FFNConfig:
    input_dim: int
    output_dim: int
    num_hidden_layers: int = 1
    hidden_dim: int = 512
    activation: str = "sigmoid"
    use_layernormalize: bool = False
    skip_connection: bool = False
    dropout_rate: Optional[float] = 0.5


def init_ffn(rng, cfg: FFNConfig, dtype=jnp.float32):
    """Xavier-uniform weights (module.py:118: init.xavier_uniform)."""
    dims = (
        [(cfg.input_dim, cfg.output_dim)]
        if cfg.num_hidden_layers <= 0
        else [(cfg.input_dim, cfg.hidden_dim)]
        + [(cfg.hidden_dim, cfg.hidden_dim)] * (cfg.num_hidden_layers - 1)
        + [(cfg.hidden_dim, cfg.output_dim)]
    )
    layers = []
    keys = jax.random.split(rng, len(dims))
    for k, (din, dout) in zip(keys, dims):
        bound = math.sqrt(6.0 / (din + dout))
        layer = {
            "w": jax.random.uniform(k, (din, dout), dtype, -bound, bound),
            "b": jnp.zeros((dout,), dtype),
        }
        if cfg.use_layernormalize:
            layer["ln_g"] = jnp.ones((dout,), dtype)
            layer["ln_b"] = jnp.zeros((dout,), dtype)
        layers.append(layer)
    return layers


def apply_ffn(params, x, cfg: FFNConfig, *, training=False, rng=None):
    """Every layer applies linear+act(+dropout); hidden layers additionally
    skip-connect (dims matching) and LayerNorm; the LAST layer applies
    act+dropout but no skip/LN (module.py:174-210 — note upstream's 'last
    layer has none of these' comment is wrong about act/dropout: SingleFFN
    always applies them)."""
    act = _ACTS[cfg.activation]
    n = len(params)
    for i, layer in enumerate(params):
        h = x @ layer["w"] + layer["b"]
        h = act(h)
        if training and cfg.dropout_rate:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1 - cfg.dropout_rate, h.shape)
            h = jnp.where(keep, h / (1 - cfg.dropout_rate), 0.0)
        is_last = i == n - 1
        if not is_last and cfg.skip_connection and h.shape[-1] == x.shape[-1]:
            h = h + x
        if not is_last and cfg.use_layernormalize:
            # torch nn.LayerNorm semantics (SingleFFN uses the builtin at
            # module.py:103, NOT the custom std-based LayerNorm class above it)
            mu = jnp.mean(h, -1, keepdims=True)
            var = jnp.var(h, -1, keepdims=True)
            h = layer["ln_g"] * (h - mu) * jax.lax.rsqrt(var + 1e-5) + layer["ln_b"]
        x = h
    return x


# ---------------------------------------------------------------------------
# the encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CspConfig:
    spa_enc_type: str = "gridcell"
    rbf_kernal_size: float = 1.0  # RFF gaussian variance (utils.py kwarg)
    num_filts: int = 256  # loc embedding dim
    num_classes: int = 1
    num_users: int = 1
    frequency_num: int = 32
    max_radius: float = 360.0
    min_radius: float = 0.1
    freq_init: str = "geometric"
    spa_f_act: str = "gelu"
    num_hidden_layer: int = 1
    hidden_dim: int = 512
    use_layn: bool = True
    skip_connection: bool = True
    dropout: float = 0.5
    map_range: Tuple[float, float, float, float] = (-180, 180, -90, 90)
    # theorydiag only (SpatialRelationEncoder.py:796-800): extra linear after
    # the block-diagonal contraction
    use_post_mat: bool = False

    @classmethod
    def from_params(cls, p: Dict[str, Any]) -> "CspConfig":
        """Build from a checkpoint's `params` dict (load_csp.py:12-27)."""
        return cls(
            spa_enc_type=p["spa_enc_type"],
            num_filts=p["num_filts"],
            num_classes=p["num_classes"],
            num_users=p.get("num_users", 1),
            frequency_num=p["frequency_num"],
            max_radius=p["max_radius"],
            min_radius=p["min_radius"],
            freq_init=p.get("freq_init", "geometric"),
            spa_f_act=p.get("spa_f_act", "relu"),
            num_hidden_layer=p.get("num_hidden_layer", 1),
            hidden_dim=p.get("hidden_dim", 512),
            use_layn=bool(p.get("use_layn", False)),
            skip_connection=bool(p.get("skip_connection", False)),
            dropout=p.get("dropout", 0.5),
            map_range=tuple(p.get("map_range", (-180, 180, -90, 90))),
            use_post_mat=bool(p.get("use_postmat", False)),
        )


class CspLocationEncoder:
    """spa PE -> FFN -> loc features (+ bias-free class/user heads)."""

    def __init__(self, config: CspConfig):
        self.config = config
        if config.spa_enc_type not in _PE_DIMS:
            raise NotImplementedError(
                f"spa_enc_type {config.spa_enc_type} not implemented "
                f"(available: {sorted(_PE_DIMS)})"
            )
        self.input_embed_dim = _PE_DIMS[config.spa_enc_type](config.frequency_num)
        self.ffn_config = FFNConfig(
            input_dim=self.input_embed_dim,
            output_dim=config.num_filts,
            num_hidden_layers=config.num_hidden_layer,
            hidden_dim=config.hidden_dim,
            activation=config.spa_f_act,
            use_layernormalize=config.use_layn,
            skip_connection=config.skip_connection,
            dropout_rate=config.dropout,
        )
        self.embedding_dim = config.num_filts

    def init(self, rng, dtype=jnp.float32, train_locs=None):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        cfg = self.config
        bound_c = 1.0 / math.sqrt(cfg.num_filts)
        params = {
            "ffn": init_ffn(k1, self.ffn_config, dtype),
            "class_emb": {"w": jax.random.uniform(
                k2, (cfg.num_filts, cfg.num_classes), dtype, -bound_c, bound_c)},
            "user_emb": {"w": jax.random.uniform(
                k3, (cfg.num_filts, cfg.num_users), dtype, -bound_c, bound_c)},
        }
        if cfg.spa_enc_type == "rff":
            kd, ks = jax.random.split(k4)
            params["rff"] = {
                "dirvec": math.sqrt(cfg.rbf_kernal_size)
                * jax.random.normal(kd, (2, cfg.frequency_num), dtype),
                "shift": jax.random.uniform(ks, (cfg.frequency_num,), dtype,
                                            0.0, 2 * math.pi),
            }
        if cfg.spa_enc_type == "rbf":
            if train_locs is None:
                raise ValueError("spa_enc_type='rbf' needs train_locs at init "
                                 "(anchor points sample from the training set, "
                                 "utils.py get_spa_encoder / baselines)")
            idx = jax.random.choice(k4, train_locs.shape[0],
                                    (cfg.frequency_num,),
                                    replace=train_locs.shape[0] < cfg.frequency_num)
            params["rbf_anchors"] = jnp.asarray(train_locs, dtype)[idx]
        if cfg.spa_enc_type == "theorydiag":
            # block-diagonal post matrix [F, 6, num_filts/F], xavier-uniform
            # (SpatialRelationEncoder.py:793-795) — replaces the FFN
            del params["ffn"]
            f = cfg.frequency_num
            assert cfg.num_filts % f == 0, (cfg.num_filts, f)
            d = cfg.num_filts // f
            bound = math.sqrt(6.0 / (6 + d))
            kp, kl = jax.random.split(k4)
            params["post_mat"] = jax.random.uniform(kp, (f, 6, d), dtype,
                                                    -bound, bound)
            if cfg.use_post_mat:
                b2 = math.sqrt(6.0 / (2 * cfg.num_filts))
                kw, kb = jax.random.split(kl)
                params["post_linear"] = {
                    "w": jax.random.uniform(kw, (cfg.num_filts, cfg.num_filts),
                                            dtype, -b2, b2),
                    "b": jnp.zeros((cfg.num_filts,), dtype),
                }
        return params

    def pe(self, coords: jnp.ndarray, params=None) -> jnp.ndarray:
        cfg = self.config
        if cfg.spa_enc_type in ("gridcell", "gridcellnorm"):
            return gridcell_embed(coords, cfg.frequency_num, cfg.max_radius,
                                  cfg.min_radius, cfg.freq_init)
        if cfg.spa_enc_type in ("theory", "theorynorm"):
            return theory_embed(coords, cfg.frequency_num, cfg.max_radius,
                                cfg.min_radius, cfg.freq_init)
        if cfg.spa_enc_type == "naive":
            return naive_embed(coords, cfg.map_range)
        if cfg.spa_enc_type == "geo_net_fft":
            return aodha_embed(coords, cfg.map_range)
        if cfg.spa_enc_type == "rff":
            return rff_embed(coords, params["rff"]["dirvec"],
                             params["rff"]["shift"], cfg.map_range)
        if cfg.spa_enc_type == "hexagridcell":
            return hexagon_embed(coords, cfg.frequency_num, cfg.max_radius)
        if cfg.spa_enc_type == "rbf":
            return rbf_embed(coords, params["rbf_anchors"], cfg.rbf_kernal_size)
        if cfg.spa_enc_type == "theorydiag":
            # same sin/cos grid as 'theory' (identical interleave since the
            # inner width 6 is even), kept [B, F, 6] for the block contraction
            flat = theory_embed(coords, cfg.frequency_num, cfg.max_radius,
                                cfg.min_radius, cfg.freq_init)
            return flat.reshape(coords.shape[0], cfg.frequency_num, 6)
        raise NotImplementedError(cfg.spa_enc_type)

    def features(self, params, coords, *, training=False, rng=None):
        cfg = self.config
        if cfg.spa_enc_type == "theorydiag":
            # einsum with the block-diagonal matrix, then activation
            # (SpatialRelationEncoder.py:893-906); dropout is a no-op at eval
            h = jnp.einsum("bfs,fsd->bfd", self.pe(coords, params),
                           params["post_mat"])
            h = h.reshape(coords.shape[0], cfg.num_filts)
            if training and rng is not None and cfg.dropout:
                keep = 1.0 - cfg.dropout
                h = h * jax.random.bernoulli(rng, keep, h.shape) / keep
            if cfg.use_post_mat:
                h = h @ params["post_linear"]["w"] + params["post_linear"]["b"]
            return _ACTS[cfg.spa_f_act](h)
        return apply_ffn(params["ffn"], self.pe(coords, params), self.ffn_config,
                         training=training, rng=rng)

    def apply(self, params, coords, *, return_feats: bool = True,
              training: bool = False, rng=None):
        """return_feats=True matches the RANGE call site (range.py:252);
        False applies the sigmoid class head (models.py:152-160)."""
        feats = self.features(params, coords, training=training, rng=rng)
        if return_feats:
            return feats
        return jax.nn.sigmoid(feats @ params["class_emb"]["w"])

    def __call__(self, params, coords, **kw):
        return self.apply(params, coords, **kw)


def csp_params_from_state_dict(sd: Dict[str, Any], cfg: CspConfig, dtype=jnp.float32):
    """Map a CSP state_dict.  Torch names: loc_enc.spa_enc.ffn.layers.{i}.
    linear.{weight,bias} (+ .layernorm.{weight,bias}), loc_enc.class_emb.weight,
    loc_enc.user_emb.weight (LocationImageEncoder aliases the same tensors at
    top level, models.py:185-190)."""

    def _t(x):
        return jnp.asarray(np.asarray(x).T, dtype)

    def _v(x):
        return jnp.asarray(np.asarray(x), dtype)

    prefix = "loc_enc.spa_enc.ffn.layers."
    layers = []
    i = 0
    while f"{prefix}{i}.linear.weight" in sd:
        layer = {"w": _t(sd[f"{prefix}{i}.linear.weight"]),
                 "b": _v(sd[f"{prefix}{i}.linear.bias"])}
        if f"{prefix}{i}.layernorm.weight" in sd:
            layer["ln_g"] = _v(sd[f"{prefix}{i}.layernorm.weight"])
            layer["ln_b"] = _v(sd[f"{prefix}{i}.layernorm.bias"])
        layers.append(layer)
        i += 1
    params = {
        "ffn": layers,
        "class_emb": {"w": _t(sd["loc_enc.class_emb.weight"])},
        "user_emb": {"w": _t(sd["loc_enc.user_emb.weight"])},
    }
    if "loc_enc.spa_enc.dirvec" in sd:  # RFF frozen parameters
        params["rff"] = {"dirvec": _v(sd["loc_enc.spa_enc.dirvec"]),
                         "shift": _v(sd["loc_enc.spa_enc.shift"])}
    return params


def load_csp(path: str, dtype=jnp.float32) -> Tuple[CspLocationEncoder, Any]:
    """get_csp equivalent (`csp/load_csp.py:9-31`), torch-free."""
    from ..convert.torch_zip import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    cfg = CspConfig.from_params(dict(ckpt["params"]))
    enc = CspLocationEncoder(cfg)
    params = csp_params_from_state_dict(ckpt["state_dict"], cfg, dtype)
    return enc, params


# ---------------------------------------------------------------------------
# TangNet (Tang et al. location-context baseline, csp/main/models.py:83-112)
# ---------------------------------------------------------------------------


def init_tangnet(rng, ip_loc_dim: int, feats_dim: int, loc_dim: int,
                 num_classes: int, use_loc: bool = True, dtype=jnp.float32):
    """fc_loc: grid one-hot -> loc embedding; fc_class: [loc ‖ image feats]
    -> classes (torch Linear default init)."""
    k1, k2 = jax.random.split(rng)

    def lin(k, din, dout):
        bound = 1.0 / math.sqrt(din)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
                "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound)}

    cls_in = feats_dim + loc_dim if use_loc else feats_dim
    return {"fc_loc": lin(k1, ip_loc_dim, loc_dim),
            "fc_class": lin(k2, cls_in, num_classes),
            "use_loc": use_loc}


def apply_tangnet(params, loc_onehot: jnp.ndarray, net_feat: jnp.ndarray
                  ) -> jnp.ndarray:
    """log_softmax class scores (models.py:101-112).  `loc_onehot` [B, G]
    one-hot grid cell, `net_feat` [B, F] image features."""
    if params["use_loc"]:
        x = jax.nn.sigmoid(loc_onehot @ params["fc_loc"]["w"]
                           + params["fc_loc"]["b"])
        x = jnp.concatenate([x, net_feat], axis=1)
    else:
        x = net_feat
    return jax.nn.log_softmax(x @ params["fc_class"]["w"]
                              + params["fc_class"]["b"], axis=1)
