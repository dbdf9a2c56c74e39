"""SatCLIP pretraining: dual-tower contrastive training, SPMD over a mesh.

Counterpart of the vendored Lightning stack (`satclip/main_old.py:15-108`,
`model_old.py:248-377`, `loss_old.py:5-47`) re-designed for TPU:

  * one pure jitted `train_step(params, opt_state, batch, rng)`;
  * data parallelism by sharding the batch along the mesh "data" axis; the
    in-batch contrastive logits [B, B] are computed under GSPMD, which
    inserts the all-gathers the reference never had (its loss_old.py
    rank/world_size plumbing was dead code at world_size=1);
  * optional tensor parallelism: ViT MLP/attention weights sharded along the
    second mesh axis via NamedShardings (see `param_shardings`);
  * AdamW with the reference's weight-decay exclusion rule — no decay for
    ndim < 2, biases, layernorms, logit_scale (`main_old.py:79-106`);
  * grad accumulation is a jax.lax.scan over microbatches (reference:
    Lightning `accumulate_grad_batches: 16`, main_old.py:129).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.resnet import ResNetConfig, apply_resnet, init_resnet
from ..models.resnet_std import StdResNetConfig, apply_std_resnet, init_std_resnet
from ..models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from ..models.vit import ViTConfig, apply_vit, init_vit

Params = Any


@dataclasses.dataclass(frozen=True)
class SatClipConfig:
    # ViTConfig or ResNetConfig — mirrors model_old.py:274-284, where a tuple
    # of vision_layers selects the ModifiedResNet branch.
    vision: Any = ViTConfig()
    location: SatClipLocationConfig = SatClipLocationConfig()
    init_logit_scale: float = math.log(1 / 0.07)  # model_old.py:332


class SatClipModel:
    """Dual tower: ViT/ResNet image encoder + (posenc -> SIREN) location
    encoder."""

    def __init__(self, config: SatClipConfig = SatClipConfig()):
        self.config = config
        self.location = SatClipLocationEncoder(config.location)

    def init(self, rng, dtype=jnp.float32) -> Params:
        kv, kl = jax.random.split(rng)
        if isinstance(self.config.vision, ResNetConfig):
            visual = init_resnet(kv, self.config.vision, dtype=dtype)
        elif isinstance(self.config.vision, StdResNetConfig):
            visual = init_std_resnet(kv, self.config.vision, dtype=dtype)
        else:
            visual = init_vit(kv, self.config.vision, dtype=dtype)
        return {
            "visual": visual,
            "location": self.location.init(kl, dtype=dtype),
            "logit_scale": jnp.asarray(self.config.init_logit_scale, dtype),
        }

    def encode_image(self, params, images):
        if isinstance(self.config.vision, ResNetConfig):
            return apply_resnet(params["visual"], images, self.config.vision)
        if isinstance(self.config.vision, StdResNetConfig):
            return apply_std_resnet(params["visual"], images, self.config.vision)
        return apply_vit(params["visual"], images, self.config.vision)

    def encode_location(self, params, coords, *, training=False, rng=None):
        return self.location.apply(params["location"], coords, training=training, rng=rng)

    def forward(self, params, images, coords, *, training=False, rng=None):
        """Returns (logits_per_image, logits_per_location), as
        `model_old.py:363-377`."""
        img = self.encode_image(params, images)
        loc = self.encode_location(params, coords, training=training, rng=rng)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        loc = loc / jnp.linalg.norm(loc, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"])
        logits_per_image = scale * img @ loc.T
        return logits_per_image, logits_per_image.T


def clip_loss(logits_per_image: jnp.ndarray, logits_per_coord: jnp.ndarray
              ) -> jnp.ndarray:
    """Symmetric cross-entropy on the in-batch diagonal (`loss_old.py:37-47`)."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    li = optax.softmax_cross_entropy_with_integer_labels(logits_per_image, labels)
    lc = optax.softmax_cross_entropy_with_integer_labels(logits_per_coord, labels)
    return (jnp.mean(li) + jnp.mean(lc)) / 2


def _decay_mask(params: Params) -> Params:
    """True where weight decay applies.  Reference rule (`main_old.py:79-87`):
    exclude ndim < 2 (biases, LN gains, logit_scale); our LN params and
    biases are all 1-D so the ndim rule subsumes the name checks."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(learning_rate=1e-4, weight_decay: float = 0.01,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW with the reference's weight-decay exclusion mask.

    `learning_rate` may be a float or any optax schedule (e.g.
    `train.fit.epoch_decay_schedule` for the CSP per-epoch decay);
    `grad_clip` is a global-norm bound (None disables clipping)."""
    steps = []
    if grad_clip is not None:
        steps.append(optax.clip_by_global_norm(grad_clip))
    steps.append(optax.adamw(learning_rate, weight_decay=weight_decay,
                             mask=_decay_mask))
    return optax.chain(*steps)


def make_train_step(model: SatClipModel, optimizer: optax.GradientTransformation,
                    accum_steps: int = 1):
    """Returns a pure `(params, opt_state, batch, rng) -> (params, opt_state,
    loss)`.  batch = {'image': [A*B, C, H, W], 'point': [A*B, 2]} with A =
    accum_steps microbatches folded along the batch axis."""

    def loss_fn(params, images, points, rng):
        li, lc = model.forward(params, images, points, training=True, rng=rng)
        return clip_loss(li, lc)

    def train_step(params, opt_state, batch, rng):
        images, points = batch["image"], batch["point"]
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, images, points, rng)
        else:
            B = images.shape[0] // accum_steps
            im = images.reshape(accum_steps, B, *images.shape[1:])
            pt = points.reshape(accum_steps, B, *points.shape[1:])
            rngs = jax.random.split(rng, accum_steps)

            def micro(carry, xs):
                g_acc, l_acc = carry
                im_i, pt_i, rng_i = xs
                l, g = jax.value_and_grad(loss_fn)(params, im_i, pt_i, rng_i)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (grads, loss), _ = jax.lax.scan(micro, (zeros, 0.0), (im, pt, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def param_shardings(params: Params, mesh: Mesh, tp_axis: Optional[str] = None
                    ) -> Params:
    """NamedShardings for the param tree: replicated by default; with
    `tp_axis`, the ViT MLP + attention projection weights are tensor-parallel
    (column-parallel fc/qkv, row-parallel proj/out — Megatron layout, XLA
    inserts the reduce)."""

    def repl(_):
        return NamedSharding(mesh, P())

    shardings = jax.tree.map(repl, params)
    if tp_axis is None:
        return shardings
    vis = params["visual"]
    svis = shardings["visual"]
    if "blocks" not in vis:  # ResNet visual: conv towers stay replicated (DP)
        return shardings
    for blk_p, blk_s in zip(vis["blocks"], svis["blocks"]):
        blk_s["mlp"]["fc"]["w"] = NamedSharding(mesh, P(None, tp_axis))
        blk_s["mlp"]["fc"]["b"] = NamedSharding(mesh, P(tp_axis))
        blk_s["mlp"]["proj"]["w"] = NamedSharding(mesh, P(tp_axis, None))
        blk_s["attn"]["qkv"]["w"] = NamedSharding(mesh, P(None, tp_axis))
        blk_s["attn"]["qkv"]["b"] = NamedSharding(mesh, P(tp_axis))
        blk_s["attn"]["out"]["w"] = NamedSharding(mesh, P(tp_axis, None))
    return shardings


def make_sharded_train_step(model: SatClipModel,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh,
                            data_axis: str = "data",
                            tp_axis: Optional[str] = None,
                            accum_steps: int = 1):
    """jit the train step with batch sharded along `data_axis` and params
    replicated (or TP-sharded along `tp_axis`).  Returns (step_fn,
    place_params, place_batch)."""
    step = make_train_step(model, optimizer, accum_steps=accum_steps)
    batch_sharding = {
        "image": NamedSharding(mesh, P(data_axis, None, None, None)),
        "point": NamedSharding(mesh, P(data_axis, None)),
    }

    def place_params(params):
        return jax.device_put(params, param_shardings(params, mesh, tp_axis))

    def place_batch(batch):
        return jax.device_put(batch, batch_sharding)

    jitted = jax.jit(step, donate_argnums=(0, 1))
    return jitted, place_params, place_batch


def cast_floating(params: Params, dtype=jnp.bfloat16) -> Params:
    """TPU counterpart of `convert_weights` (model_old.py:379-400): cast the
    float leaves of a param tree for low-precision serving (bf16 on TPU, not
    fp16 — bf16 keeps f32's exponent range so no loss-scale bookkeeping).
    Integer/bool leaves (e.g. int8 quantized values) pass through."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
