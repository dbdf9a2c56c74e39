"""SINR-style species-distribution losses (pure jnp).

Counterpart of `range/utils/losses.py` (the presence-only / presence-absence
loss family from Cole et al. 2023 that the reference carries for training
location encoders on occurrence data):

  * `an_loss`          — plain cross-entropy "assume negative" (:119-125)
  * `slds_loss`        — same location, different species (:52-64)
  * `ssdl_loss`        — same species, random different location (:66-90)
  * `full_loss`        — weighted SSDL+SLDS combination (:92-117)
  * `mse_loss`         — regression on logits (:43-50)
  * `get_loss_fn`      — dispatch (:26-41)
  * `random_lonlats`   — area-uniform sphere sampling (:14-21)

Each loss takes `(apply_fn, params, rng, lonlats, labels)` with
``apply_fn(params, lonlats) -> logits`` so any encoder+head pairs with them.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def random_lonlats(rng, batch_size: int) -> jnp.ndarray:
    """Gaussian-on-sphere sampling (losses.py:14-21)."""
    xyz = jax.random.normal(rng, (3, batch_size))
    az = jnp.arctan2(xyz[1], xyz[0])
    el = jnp.arctan2(xyz[2], jnp.hypot(xyz[0], xyz[1]))
    return jnp.stack([jnp.degrees(az), jnp.degrees(el)], axis=1)


def _log_loss(p):
    return -jnp.log(p + 1e-5)


def an_loss(apply_fn, params, rng, lonlats, labels):
    """Cross-entropy / BCE 'assume negative' (losses.py:119-125)."""
    logits = apply_fn(params, lonlats)
    if logits.shape[1] == 1:
        return jnp.mean(optax.sigmoid_binary_cross_entropy(
            logits[:, 0], labels.astype(logits.dtype)))
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def mse_loss(apply_fn, params, rng, lonlats, labels):
    logits = apply_fn(params, lonlats)
    if logits.shape[1] == 1:
        logits = logits[:, 0]
    return jnp.mean((logits - labels.astype(logits.dtype)) ** 2)


def slds_loss(apply_fn, params, rng, lonlats, labels):
    """Same location, different (random) species (losses.py:52-64)."""
    logits = apply_fn(params, lonlats)
    B, K = logits.shape
    rows = jnp.arange(B)
    pos = logits[rows, labels]
    neg_cls = jax.random.randint(rng, (B,), 0, K)
    neg = logits[rows, neg_cls]
    loss = jnp.sum(_log_loss(jax.nn.sigmoid(pos))) + jnp.sum(
        _log_loss(1 - jax.nn.sigmoid(neg)))
    return loss / B


def ssdl_loss(apply_fn, params, rng, lonlats, labels):
    """Same species, random different location (losses.py:66-90)."""
    k_loc, k_cls = jax.random.split(rng)
    B = lonlats.shape[0]
    rand = random_lonlats(k_loc, B).astype(lonlats.dtype)
    logits = apply_fn(params, jnp.concatenate([lonlats, rand], 0))
    pred, pred_rand = logits[:B], logits[B:]
    rows = jnp.arange(B)
    pos = pred[rows, labels]
    K = pred.shape[1]
    neg = pred_rand[rows, jax.random.randint(k_cls, (B,), 0, K)]
    return (jnp.mean(_log_loss(jax.nn.sigmoid(pos)))
            + jnp.mean(_log_loss(1 - jax.nn.sigmoid(neg))))


def full_loss(apply_fn, params, rng, lonlats, labels, loss_weight: float = 2048):
    """Full 'assume negative' (losses.py:92-117): positives up-weighted, all
    other classes negative at the data location, everything negative at a
    random location."""
    B = lonlats.shape[0]
    rand = random_lonlats(rng, B).astype(lonlats.dtype)
    logits = apply_fn(params, jnp.concatenate([lonlats, rand], 0))
    pred, pred_rand = logits[:B], logits[B:]
    K = pred.shape[1]
    rows = jnp.arange(B)
    pos = pred[rows, labels]
    sig = jax.nn.sigmoid(pred)
    onehot = jax.nn.one_hot(labels, K, dtype=bool)
    loss_dl_pos = jnp.sum(_log_loss(jax.nn.sigmoid(pos))) / (B * K)
    loss_dl_neg = jnp.sum(jnp.where(onehot, 0.0, _log_loss(1 - sig))) / (B * K)
    loss_rl = jnp.mean(jnp.sum(_log_loss(1 - jax.nn.sigmoid(pred_rand)), axis=1)) / K
    return loss_weight * loss_dl_pos + loss_dl_neg + loss_rl


def get_loss_fn(presence_only: bool = False, loss_weight: float = 2048,
                regression: bool = False) -> Callable:
    """Dispatch mirroring losses.py:26-41."""
    if regression:
        return mse_loss
    if presence_only:
        return functools.partial(full_loss, loss_weight=loss_weight)
    return an_loss
