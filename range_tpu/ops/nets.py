"""Trainable heads: SIREN, MLP, FCNet — pure pytree params + apply fns.

TPU-native counterpart of `range/location_models/satclip/location_encoder.py`
(SirenNet/Siren/Sine at lines 73-151, MLP at 52-64, FCNet/ResLayer at 13-49).
No module objects: each net is an ``init(rng) -> params`` plus a jittable
``apply(params, x, *, training, rng) -> y``.  Weight layouts are chosen so a
torch ``state_dict`` converts by transposing each ``weight`` matrix
(torch Linear stores [out, in]; we store [in, out] so the forward is a plain
``x @ w + b`` on the MXU).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Any


def _uniform(rng, shape, bound, dtype):
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-bound, maxval=bound)


def linear_init(rng, dim_in: int, dim_out: int, use_bias: bool = True,
                dtype=jnp.float32) -> Params:
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both w, b."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(dim_in)
    p = {"w": _uniform(kw, (dim_in, dim_out), bound, dtype)}
    if use_bias:
        p["b"] = _uniform(kb, (dim_out,), bound, dtype)
    return p


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# --------------------------------------------------------------------------
# SIREN
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SirenNet:
    """Sinusoidal representation network.

    Mirrors `location_encoder.py:73-151`: ``num_layers`` hidden sine layers
    (w0=30 on the first, w0=1 after, principled uniform init, per-layer
    dropout p=0.5 during training) followed by a final sine layer.  This is
    the head of the released SatCLIP-ViT16-L40 checkpoint (pe_type='siren').
    """

    dim_in: int
    dim_hidden: int
    dim_out: int
    num_layers: int
    w0: float = 1.0
    w0_initial: float = 30.0
    use_bias: bool = True
    dropout: bool = True
    c: float = 6.0
    # The reference's final activation is nn.Identity: SirenNet passes
    # `final_activation=None` which is replaced by Identity *before* the last
    # Siren layer sees it (`location_encoder.py:95-96,135`), so the last layer
    # is linear.  'sine' gives a true sine-output SIREN.
    final_activation: str = "identity"

    def init(self, rng, dtype=jnp.float32) -> Params:
        layers: List[Params] = []
        keys = jax.random.split(rng, self.num_layers + 1)
        for ind in range(self.num_layers):
            is_first = ind == 0
            d_in = self.dim_in if is_first else self.dim_hidden
            layer_w0 = self.w0_initial if is_first else self.w0
            w_std = (1.0 / d_in) if is_first else (math.sqrt(self.c / d_in) / layer_w0)
            kw, kb = jax.random.split(keys[ind])
            layer = {"w": _uniform(kw, (d_in, self.dim_hidden), w_std, dtype)}
            if self.use_bias:
                layer["b"] = _uniform(kb, (self.dim_hidden,), w_std, dtype)
            layers.append(layer)
        # last layer: w0 = self.w0, never "first"
        w_std = math.sqrt(self.c / self.dim_hidden) / self.w0
        kw, kb = jax.random.split(keys[-1])
        last = {"w": _uniform(kw, (self.dim_hidden, self.dim_out), w_std, dtype)}
        if self.use_bias:
            last["b"] = _uniform(kb, (self.dim_out,), w_std, dtype)
        return {"layers": layers, "last": last}

    def apply(self, params: Params, x: jnp.ndarray, *, training: bool = False,
              rng=None, mods: Optional[Sequence[jnp.ndarray]] = None,
              first_preact: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Forward.  ``mods`` optionally modulates each hidden activation
        (latent-modulated SIREN, `location_encoder.py:104-110`).
        ``first_preact``: precomputed layer-0 pre-activation (x @ w0 + b0) —
        lets callers fuse the positional-encoding basis into the first
        matmul (ops/sh.spherical_harmonics_times); ``x`` is then ignored
        for layer 0."""
        if training and self.dropout and rng is None:
            raise ValueError("training=True with dropout requires an rng")
        for ind, layer in enumerate(params["layers"]):
            layer_w0 = self.w0_initial if ind == 0 else self.w0
            h = first_preact if (ind == 0 and first_preact is not None) \
                else linear_apply(layer, x)
            if self.dropout and training:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, h.shape)
                h = jnp.where(keep, h / 0.5, 0.0)
            x = jnp.sin(layer_w0 * h)
            if mods is not None and mods[ind] is not None:
                x = x * mods[ind]
        h = linear_apply(params["last"], x)
        if self.final_activation == "sine":
            return jnp.sin(self.w0 * h)
        if self.final_activation == "identity":
            return h
        raise ValueError(f"unknown final_activation {self.final_activation}")


# --------------------------------------------------------------------------
# MLP
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MLP:
    """ReLU MLP.  Mirrors `location_encoder.py:52-64`: input layer + ReLU,
    ``num_layers`` x (hidden layer + ReLU), then a linear output layer.

    NOTE: the reference builds hidden layers with ``[layer] * num_layers`` —
    the *same module repeated*, i.e. tied weights.  That is almost certainly
    unintended upstream, but we reproduce it (``tied=True``) so converted
    checkpoints and param counts line up; set ``tied=False`` for the sane
    variant.
    """

    input_dim: int
    dim_hidden: int
    num_layers: int
    out_dims: int
    tied: bool = True

    def init(self, rng, dtype=jnp.float32) -> Params:
        k_in, k_hid, k_out = jax.random.split(rng, 3)
        params = {"input": linear_init(k_in, self.input_dim, self.dim_hidden, dtype=dtype)}
        if self.tied:
            params["hidden"] = [linear_init(k_hid, self.dim_hidden, self.dim_hidden, dtype=dtype)]
        else:
            params["hidden"] = [
                linear_init(k, self.dim_hidden, self.dim_hidden, dtype=dtype)
                for k in jax.random.split(k_hid, self.num_layers)
            ]
        params["out"] = linear_init(k_out, self.dim_hidden, self.out_dims, dtype=dtype)
        return params

    def apply(self, params: Params, x: jnp.ndarray, *, training: bool = False,
              rng=None, first_preact: Optional[jnp.ndarray] = None):
        x = jax.nn.relu(first_preact if first_preact is not None
                        else linear_apply(params["input"], x))
        hidden = params["hidden"]
        for i in range(self.num_layers):
            layer = hidden[0] if self.tied else hidden[i]
            x = jax.nn.relu(linear_apply(layer, x))
        return linear_apply(params["out"], x)


# --------------------------------------------------------------------------
# FCNet (SINR-style residual net with class head)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FCNet:
    """Linear + ReLU + 4 residual blocks + bias-free class head.

    Mirrors `location_encoder.py:13-49`.  Each ResLayer is
    ``x + relu(w2(dropout(relu(w1 x))))`` with p=0.5 dropout during training.
    """

    num_inputs: int
    num_classes: int
    dim_hidden: int
    num_res_layers: int = 4

    def init(self, rng, dtype=jnp.float32) -> Params:
        keys = jax.random.split(rng, self.num_res_layers + 2)
        res = []
        for i in range(self.num_res_layers):
            k1, k2 = jax.random.split(keys[i])
            res.append(
                {
                    "w1": linear_init(k1, self.dim_hidden, self.dim_hidden, dtype=dtype),
                    "w2": linear_init(k2, self.dim_hidden, self.dim_hidden, dtype=dtype),
                }
            )
        return {
            "input": linear_init(keys[-2], self.num_inputs, self.dim_hidden, dtype=dtype),
            "res": res,
            "class_emb": linear_init(
                keys[-1], self.dim_hidden, self.num_classes, use_bias=False, dtype=dtype
            ),
        }

    def features(self, params: Params, x: jnp.ndarray, *, training: bool = False, rng=None):
        x = jax.nn.relu(linear_apply(params["input"], x))
        for block in params["res"]:
            y = jax.nn.relu(linear_apply(block["w1"], x))
            if training:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, y.shape)
                y = jnp.where(keep, y / 0.5, 0.0)
            y = jax.nn.relu(linear_apply(block["w2"], y))
            x = x + y
        return x

    def apply(self, params: Params, x: jnp.ndarray, *, training: bool = False, rng=None):
        feats = self.features(params, x, training=training, rng=rng)
        return linear_apply(params["class_emb"], feats)


def get_neural_network(name: str, input_dim: int, num_classes: int = 256,
                       dim_hidden: int = 256, num_layers: int = 2):
    """Name-dispatch factory.  Mirrors `location_encoder.py:241-265`."""
    if name == "linear":

        @dataclasses.dataclass(frozen=True)
        class _Linear:
            dim_in: int
            dim_out: int

            def init(self, rng, dtype=jnp.float32):
                return linear_init(rng, self.dim_in, self.dim_out, dtype=dtype)

            def apply(self, params, x, *, training=False, rng=None):
                return linear_apply(params, x)

        return _Linear(input_dim, num_classes)
    if name == "mlp":
        return MLP(input_dim=input_dim, dim_hidden=dim_hidden, num_layers=num_layers,
                   out_dims=num_classes)
    if name == "siren":
        return SirenNet(dim_in=input_dim, dim_hidden=dim_hidden, num_layers=num_layers,
                        dim_out=num_classes)
    if name == "fcnet":
        return FCNet(num_inputs=input_dim, num_classes=num_classes, dim_hidden=dim_hidden)
    raise ValueError(f"{name} not a known neural network.")


# ---------------------------------------------------------------------------
# Latent-modulated SIREN (location_encoder.py:154-214, unused in the RANGE
# path but part of the vendored net zoo)
# ---------------------------------------------------------------------------


def init_modulator(rng, dim_in: int, dim_hidden: int, num_layers: int,
                   dtype=jnp.float32):
    """Modulator (location_encoder.py:154-177): layer i maps
    [hidden ‖ latent] (latent alone for i=0) -> ReLU hidden; each hidden is
    one per-layer modulation signal for SirenNet's `mods`."""
    layers = []
    keys = jax.random.split(rng, num_layers)
    for ind in range(num_layers):
        d = dim_in if ind == 0 else dim_hidden + dim_in
        bound = 1.0 / math.sqrt(d)
        kw, kb = jax.random.split(keys[ind])
        layers.append({
            "w": jax.random.uniform(kw, (d, dim_hidden), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (dim_hidden,), dtype, -bound, bound),
        })
    return {"layers": layers}


def apply_modulator(params, z: jnp.ndarray):
    """latent [*, dim_in] -> tuple of per-layer modulations [*, dim_hidden]
    (location_encoder.py:168-177: hidden re-concatenated with the latent
    between layers)."""
    x = z
    hiddens = []
    for layer in params["layers"]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
        hiddens.append(x)
        x = jnp.concatenate([x, z], axis=-1)
    return tuple(hiddens)


def image_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """[-1, 1]^2 pixel-center lattice, (h w) x 2 row-major — the SirenWrapper
    coordinate buffer (location_encoder.py:196-199)."""
    ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], axis=-1).reshape(height * width, 2)


def siren_image(net: "SirenNet", net_params, height: int, width: int,
                modulator_params=None, latent=None) -> jnp.ndarray:
    """SirenWrapper forward (location_encoder.py:203-214): evaluate the SIREN
    over the image lattice, optionally modulated by a latent, and reshape to
    [1, C, H, W].  Train by MSE against an image, as upstream."""
    mods = (apply_modulator(modulator_params, latent)
            if modulator_params is not None else None)
    dtype = jax.tree_util.tree_leaves(net_params)[0].dtype
    out = net.apply(net_params, image_grid(height, width, dtype), mods=mods)
    return out.reshape(height, width, -1).transpose(2, 0, 1)[None]
