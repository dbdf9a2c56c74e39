"""CSP contrastive pretraining — losses + train step, jitted end-to-end.

Counterpart of the vendored CSP training stack (`csp/main/losses.py`,
`trainer_helper.py:21-110`): location embeddings are contrasted against
image-CNN features projected into embedding space, with three softmax terms
(`contsoftmax_loss`, losses.py:104-217):

  1. in-batch: CE over sim(X, I)/T_inbatch rows (optionally symmetric);
  2. negative locations: CE of [sim(X,I); sim(X^-,I)]/T_negloc with the true
     location first, X^- uniform/spherical random negatives (rand_samples,
     losses.py:18-73);
  3. SimCSE: CE over sim(X, X^+)/T_simcse where X^+ is a second forward pass
     with a different dropout mask.

Also implemented: `imgcontloss` (sigmoid BCE variant, losses.py:227-330) and
`l2regress` (losses.py:75-102).  All sampling uses the jax PRNG (traced), the
whole step is one jitted function; batch data-parallelism comes from sharding
the batch along a mesh "data" axis like train/satclip.py.
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import optax

from ..models.csp import CspLocationEncoder


@dataclasses.dataclass(frozen=True)
class CspTrainConfig:
    unsuper_loss: str = "contsoftmax"  # contsoftmax | contsoftmaxsym | imgcontloss | l2regress
    cnn_feat_dim: int = 2048
    num_neg_rand_loc: int = 1
    neg_rand_type: str = "spherical"  # 'spherical' | 'uniform'
    unsuper_temp_inbatch: float = 1.0
    unsuper_temp_negloc: float = 1.0
    unsuper_temp_simcse: float = 1.0
    rand_sample_weight: float = 1.0
    simcse_weight: float = 1.0


class CspTrainer:
    """Encoder + image/location decoders + loss dispatch."""

    def __init__(self, encoder: CspLocationEncoder, config: CspTrainConfig):
        self.encoder = encoder
        self.config = config

    def init(self, rng, dtype=jnp.float32):
        k_enc, k_dec = jax.random.split(rng)
        params = self.encoder.init(k_enc, dtype=dtype)
        d = self.encoder.embedding_dim
        cfg = self.config
        kw, kb = jax.random.split(k_dec)
        if cfg.unsuper_loss == "l2regress":
            # loc_dec: loc_emb -> cnn feature space (models.py:198)
            bound = 1.0 / math.sqrt(d)
            params["loc_dec"] = {
                "w": jax.random.uniform(kw, (d, cfg.cnn_feat_dim), dtype, -bound, bound),
                "b": jax.random.uniform(kb, (cfg.cnn_feat_dim,), dtype, -bound, bound),
            }
        else:
            # img_dec: cnn features -> loc embedding space (models.py:200)
            bound = 1.0 / math.sqrt(cfg.cnn_feat_dim)
            params["img_dec"] = {
                "w": jax.random.uniform(kw, (cfg.cnn_feat_dim, d), dtype, -bound, bound),
                "b": jax.random.uniform(kb, (d,), dtype, -bound, bound),
            }
        return params

    # -- sampling ------------------------------------------------------------

    def rand_locations(self, rng, n: int) -> jnp.ndarray:
        """Random negative (lon, lat) degrees.  Mirrors `rand_samples`
        (losses.py:18-73) INCLUDING its quirk: for spa_enc models the
        reference scales `rand_feats_orig` — which the 'spherical' branch has
        overwritten with raw U[0,1] draws (losses.py:47-60,65-68) — so
        'spherical' negatives actually land in lon [0,180] x lat [0,90].
        'spherical_correct' gives true area-uniform sampling on the sphere.
        """
        cfg = self.config
        if cfg.neg_rand_type == "uniform":
            u = jax.random.uniform(rng, (n, 2), minval=-1.0, maxval=1.0)
            lon, lat = u[:, 0], u[:, 1]
        elif cfg.neg_rand_type == "spherical":
            # faithful to the upstream bug: raw U[0,1] draws scaled to degrees
            u = jax.random.uniform(rng, (n, 2))
            lon, lat = u[:, 0], u[:, 1]
        elif cfg.neg_rand_type == "spherical_correct":
            k1, k2 = jax.random.split(rng)
            theta1 = 2 * jnp.pi * jax.random.uniform(k1, (n,))
            theta2 = jnp.arccos(2 * jax.random.uniform(k2, (n,)) - 1)
            lat = 1.0 - 2.0 * theta2 / jnp.pi
            lon = theta1 / jnp.pi - 1.0
        else:
            raise ValueError(cfg.neg_rand_type)
        return jnp.stack([lon * 180.0, lat * 90.0], axis=1)

    # -- losses ----------------------------------------------------------------

    def _norm(self, x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def loss(self, params, rng, loc_feat: jnp.ndarray, cnn_features: jnp.ndarray
             ) -> jnp.ndarray:
        cfg = self.config
        if cfg.unsuper_loss == "l2regress":
            loc_emb = self.encoder.features(params, loc_feat)
            pred = loc_emb @ params["loc_dec"]["w"] + params["loc_dec"]["b"]
            return jnp.mean((pred - cnn_features) ** 2)
        if "contsoftmax" in cfg.unsuper_loss:
            return self._contsoftmax(params, rng, loc_feat, cnn_features)
        if "imgcontloss" in cfg.unsuper_loss:
            return self._imgcontloss(params, rng, loc_feat, cnn_features)
        raise ValueError(cfg.unsuper_loss)

    def _embed(self, params, coords, rng=None):
        training = rng is not None
        return self._norm(
            self.encoder.features(params, coords, training=training, rng=rng)
        )

    def _contsoftmax(self, params, rng, loc_feat, cnn_features):
        cfg = self.config
        B = loc_feat.shape[0]
        k_drop1, k_drop2, k_drop3, k_neg = jax.random.split(rng, 4)
        labels = jnp.arange(B)

        loc = self._embed(params, loc_feat, k_drop1)
        img = self._norm(cnn_features @ params["img_dec"]["w"] + params["img_dec"]["b"])

        # 1. in-batch CE (losses.py:143-162)
        sims = (loc @ img.T) / cfg.unsuper_temp_inbatch
        loss_inbatch = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(sims, labels))
        if cfg.unsuper_loss == "contsoftmaxsym":
            loss_inbatch += jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(sims.T, labels))

        # 2. negative-location CE (losses.py:164-196): logits [B, 1+R] with the
        # true location first
        neg = self.rand_locations(k_neg, B * cfg.num_neg_rand_loc)
        loc_rand = self._embed(params, neg, k_drop2).reshape(
            cfg.num_neg_rand_loc, B, -1)
        cat = jnp.concatenate([loc[None], loc_rand], axis=0)  # [1+R, B, D]
        sims_neg = jnp.einsum("nbd,bd->bn", cat, img) / cfg.unsuper_temp_negloc
        loss_negloc = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            sims_neg, jnp.zeros((B,), jnp.int32)))

        # 3. SimCSE CE (losses.py:199-215): second dropout pass of the same X
        loc2 = self._embed(params, loc_feat, k_drop3)
        sims_cse = (loc @ loc2.T) / cfg.unsuper_temp_simcse
        loss_simcse = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(sims_cse, labels))

        return (loss_inbatch + loss_negloc * cfg.rand_sample_weight
                + loss_simcse * cfg.simcse_weight)

    def _imgcontloss(self, params, rng, loc_feat, cnn_features):
        """Sigmoid-BCE variant (losses.py:227-330): positive diagonal weighted
        by (B-1), negatives averaged; plus random-location negatives."""
        cfg = self.config
        B = loc_feat.shape[0]
        k_drop, k_neg = jax.random.split(rng)
        loc = self._embed(params, loc_feat, k_drop)
        img = self._norm(cnn_features @ params["img_dec"]["w"] + params["img_dec"]["b"])

        def bce(p):
            return -jnp.log(p + 1e-5)

        sims = jax.nn.sigmoid(loc @ img.T)
        eye = jnp.eye(B)
        loss_pos = bce(jnp.diagonal(sims))
        loss_neg = bce(1.0 - sims) * (1 - eye) + eye * (B - 1) * loss_pos[:, None]
        loss_pos_neg = jnp.sum(loss_neg, axis=-1) / (B - 1)

        neg = self.rand_locations(k_neg, B * cfg.num_neg_rand_loc)
        loc_rand = self._embed(params, neg).reshape(cfg.num_neg_rand_loc, B, -1)
        sims_rand = jax.nn.sigmoid(jnp.einsum("nbd,bd->nb", loc_rand, img))
        loss_rand = jnp.mean(bce(1.0 - sims_rand), axis=0)

        return jnp.mean(loss_pos_neg) + jnp.mean(loss_rand) * cfg.rand_sample_weight


def make_train_step(trainer: CspTrainer, optimizer: optax.GradientTransformation):
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            return trainer.loss(p, rng, batch["loc_feat"], batch["cnn_features"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def embedding_loss(trainer: CspTrainer, params, rng, loc_feat: jnp.ndarray,
                   loc_class: jnp.ndarray, user_ids=None,
                   rand_sample_weight: float = 1.0) -> jnp.ndarray:
    """Supervised geo_prior presence-absence loss (`losses.py:395-469`,
    eq. 7-9 of arXiv:1906.05272): sigmoid class scores, positives up-weighted
    by num_classes, random background locations pushed to absence; optional
    user-affinity terms when `user_ids` is given.

    Functional (trainer, params) rather than a method so the supervised CSP
    path composes with any encoder the trainer wraps."""
    enc, cfg = trainer.encoder, trainer.config
    B = loc_feat.shape[0]
    eps = 1e-5  # bce_loss = -log(x + 1e-5), losses.py:6-7

    def bce(x):
        return -jnp.log(x + eps)

    loc_rand = trainer.rand_locations(rng, B)
    emb_cat = enc.features(params, jnp.concatenate([loc_feat, loc_rand], 0))
    loc_emb, loc_emb_rand = emb_cat[:B], emb_cat[B:]
    loc_pred = jax.nn.sigmoid(loc_emb @ params["class_emb"]["w"])
    loc_pred_rand = jax.nn.sigmoid(loc_emb_rand @ params["class_emb"]["w"])

    pos_weight = loc_pred.shape[1]  # num_classes
    onehot = jax.nn.one_hot(loc_class, loc_pred.shape[1], dtype=loc_pred.dtype)
    loss_pos = bce(1.0 - loc_pred) * (1.0 - onehot) \
        + pos_weight * bce(loc_pred) * onehot
    loss_bg = bce(1.0 - loc_pred_rand)
    total = jnp.mean(loss_pos)
    if user_ids is None:
        return total + jnp.mean(loss_bg) * rand_sample_weight

    user = params["user_emb"]["w"].T[user_ids]  # [B, num_filts]
    p_u_given_l = jax.nn.sigmoid(jnp.sum(user * loc_emb, axis=1))
    p_u_given_randl = jax.nn.sigmoid(jnp.sum(user * loc_emb_rand, axis=1))
    p_c_given_u = jax.nn.sigmoid(user @ params["class_emb"]["w"])
    user_class_loss = bce(1.0 - p_c_given_u) * (1.0 - onehot) \
        + pos_weight * bce(p_c_given_u) * onehot
    return (total + jnp.mean(loss_bg) + jnp.mean(bce(p_u_given_l))
            + jnp.mean(bce(1.0 - p_u_given_randl))
            + jnp.mean(user_class_loss))
