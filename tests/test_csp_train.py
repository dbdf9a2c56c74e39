"""CSP training losses + step and SINR-style losses: gradients flow, losses
decrease, shapes/semantics sane."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from range_tpu.models.csp import CspConfig, CspLocationEncoder
from range_tpu.train import losses as sinr_losses
from range_tpu.train.csp import CspTrainConfig, CspTrainer, make_train_step


def _trainer(loss="contsoftmax"):
    enc = CspLocationEncoder(CspConfig(spa_enc_type="gridcell", num_filts=32,
                                       num_classes=5, frequency_num=8,
                                       hidden_dim=64, dropout=0.2))
    return CspTrainer(enc, CspTrainConfig(unsuper_loss=loss, cnn_feat_dim=48,
                                          num_neg_rand_loc=2))


def _batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "loc_feat": jnp.asarray(
            np.stack([rng.uniform(-180, 180, b), rng.uniform(-90, 90, b)], 1),
            jnp.float32),
        "cnn_features": jnp.asarray(rng.standard_normal((b, 48)), jnp.float32),
    }


@pytest.mark.parametrize("loss", ["contsoftmax", "contsoftmaxsym", "imgcontloss",
                                  "l2regress"])
def test_csp_losses_decrease(loss):
    tr = _trainer(loss)
    params = tr.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    step = make_train_step(tr, opt)
    opt_state = opt.init(params)
    batch = _batch()
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(10):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, batch, sub)
        losses.append(float(l))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_rand_locations_ranges():
    tr = _trainer()
    for kind in ["uniform", "spherical", "spherical_correct"]:
        tr2 = CspTrainer(tr.encoder, CspTrainConfig(neg_rand_type=kind))
        pts = np.asarray(tr2.rand_locations(jax.random.PRNGKey(0), 2000))
        assert pts[:, 0].min() >= -180 and pts[:, 0].max() <= 180
        assert pts[:, 1].min() >= -90 and pts[:, 1].max() <= 90
        if kind == "spherical":
            # faithful to the upstream quirk (losses.py:47-68): raw U[0,1]
            # draws scaled to degrees => NE quadrant only
            assert pts[:, 0].min() >= 0 and pts[:, 1].min() >= 0
        if kind == "spherical_correct":
            # area-uniform: |lat| > 60deg holds ~13.4% of the sphere
            frac_high = np.mean(np.abs(pts[:, 1]) > 60)
            assert 0.08 < frac_high < 0.2


def _toy_model():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6)), jnp.float32)

    def apply_fn(params, lonlats):
        from range_tpu.models.sinr import preprocess_locs

        return preprocess_locs(lonlats) @ params

    return apply_fn, w * 0.1


@pytest.mark.parametrize("name", ["an", "slds", "ssdl", "full", "mse"])
def test_sinr_losses_finite_and_grad(name):
    apply_fn, params = _toy_model()
    rng = np.random.default_rng(1)
    lonlats = jnp.asarray(
        np.stack([rng.uniform(-180, 180, 8), rng.uniform(-90, 90, 8)], 1), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 6, 8))
    fn = {
        "an": sinr_losses.an_loss,
        "slds": sinr_losses.slds_loss,
        "ssdl": sinr_losses.ssdl_loss,
        "full": sinr_losses.full_loss,
        "mse": lambda a, p, r, x, y: sinr_losses.mse_loss(
            a, p, r, x, jnp.zeros((8, 6), jnp.float32)),
    }[name]
    loss, grad = jax.value_and_grad(lambda p: fn(apply_fn, p, jax.random.PRNGKey(2),
                                                 lonlats, labels))(params)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.max(jnp.abs(grad))) > 0


def test_get_loss_fn_dispatch():
    assert sinr_losses.get_loss_fn(regression=True) is sinr_losses.mse_loss
    assert sinr_losses.get_loss_fn() is sinr_losses.an_loss
    po = sinr_losses.get_loss_fn(presence_only=True, loss_weight=100)
    assert po.func is sinr_losses.full_loss


def test_embedding_loss_supervised():
    """Supervised geo_prior loss (losses.py:395-469): positives dominate,
    user term optional, differentiable."""
    import numpy as np

    from range_tpu.models.csp import CspConfig, CspLocationEncoder
    from range_tpu.train.csp import CspTrainConfig, CspTrainer, embedding_loss

    enc = CspLocationEncoder(CspConfig(spa_enc_type="gridcell", num_filts=32,
                                       num_classes=5, num_users=3,
                                       frequency_num=4))
    tr = CspTrainer(enc, CspTrainConfig())
    params = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    locs = jnp.asarray(np.stack([rng.uniform(-180, 180, 8),
                                 rng.uniform(-90, 90, 8)], 1), jnp.float32)
    cls = jnp.asarray(rng.integers(0, 5, 8))
    uid = jnp.asarray(rng.integers(0, 3, 8))

    base = float(embedding_loss(tr, params, jax.random.PRNGKey(1), locs, cls))
    with_user = float(embedding_loss(tr, params, jax.random.PRNGKey(1), locs,
                                     cls, user_ids=uid))
    assert np.isfinite(base) and with_user > base  # extra BCE terms add loss

    # training against it must raise the true-class probability
    import optax

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        l, g = jax.value_and_grad(
            lambda q: embedding_loss(tr, q, key, locs, cls))(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    def true_prob(p):
        emb = enc.features(p, locs)
        pred = jax.nn.sigmoid(emb @ p["class_emb"]["w"])
        return float(jnp.mean(pred[jnp.arange(8), cls]))

    before = true_prob(params)
    key = jax.random.PRNGKey(2)
    for i in range(60):
        key, k = jax.random.split(key)
        params, state, _ = step(params, state, k)
    assert true_prob(params) > before
