"""CSP training recipes + supporting data utilities.

Counterparts of the remaining CSP training surface:
  * `encode_loc_time` (`csp/main/utils.py:225-273`): geo_net input features —
    cos/sin, 3D, or raw encodings of normalized (lon, lat) (+date).
  * `BalancedSampler` (`csp/main/utils.py:275-326`): even per-class sampling.
  * run recipes (`run-fmow-contsoftmax.sh`, `run-inat_2018-contsoftmax.sh`):
    the full flag sets preserved as config presets; `make_run_name` encodes
    hyperparameters into the model file name the way the reference does
    (`csp/main/utils.py:26-156`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.csp import CspConfig
from .csp import CspTrainConfig


def encode_loc_time(loc_ip: jnp.ndarray, date_ip: Optional[jnp.ndarray] = None,
                    loc_encode: str = "encode_cos_sin",
                    date_encode: str = "encode_cos_sin",
                    use_date_feats: bool = False) -> jnp.ndarray:
    """Inputs normalized to [-1, 1] (lon/180, lat/90); mirrors utils.py:225-273."""
    pi = jnp.pi
    if loc_encode == "encode_cos_sin":
        feats = jnp.concatenate([jnp.sin(pi * loc_ip), jnp.cos(pi * loc_ip)], -1)
    elif loc_encode == "encode_3D":
        lon, lat = pi * loc_ip[..., 0], pi * loc_ip[..., 1]
        feats = jnp.stack(
            [jnp.cos(lon) * jnp.cos(lat), jnp.sin(lon) * jnp.cos(lat), jnp.sin(lat)],
            axis=-1)
    elif loc_encode == "encode_none":
        feats = loc_ip
    else:
        raise ValueError(loc_encode)
    if use_date_feats:
        if date_encode == "encode_cos_sin":
            d = date_ip[..., None]
            feats = jnp.concatenate([feats, jnp.sin(pi * d), jnp.cos(pi * d)], -1)
        elif date_encode == "encode_none":
            feats = jnp.concatenate([feats, date_ip[..., None]], -1)
        else:
            raise ValueError(date_encode)
    return feats


def balanced_indices(classes: np.ndarray, num_per_class: int,
                     use_replace: bool = False, seed: int = 0) -> np.ndarray:
    """One epoch of class-balanced sample indices (BalancedSampler.__iter__
    semantics, utils.py:275-326), as a numpy index array."""
    rng = np.random.default_rng(seed)
    indices = []
    for cc in np.unique(classes):
        members = np.nonzero(classes == cc)[0]
        if use_replace:
            indices.extend(rng.choice(members, num_per_class, replace=True))
        else:
            indices.extend(rng.choice(members, min(len(members), num_per_class),
                                      replace=False))
    indices = np.asarray(indices)
    rng.shuffle(indices)
    return indices


@dataclasses.dataclass(frozen=True)
class CspRecipe:
    """One reference run recipe: model config + training config + optimizer."""

    name: str
    model: CspConfig
    train: CspTrainConfig
    lr: float
    weight_decay: float
    epochs: int = 30
    batch_size: int = 512
    # per-epoch multiplicative lr decay, lr * lr_decay**epoch
    # (csp/main/trainer.py:193 default 0.98, applied at :730,759)
    lr_decay: float = 0.98
    grad_clip: float = 1.0


def recipe_optimizer(recipe: CspRecipe, steps_per_epoch: int):
    """AdamW with the recipe's lr schedule (per-epoch decay) + grad clip,
    ready for `make_train_step` / `fit`."""
    from .fit import epoch_decay_schedule
    from .satclip import make_optimizer

    sched = (epoch_decay_schedule(recipe.lr, recipe.lr_decay, steps_per_epoch)
             if recipe.lr_decay != 1.0 else recipe.lr)
    return make_optimizer(sched, weight_decay=recipe.weight_decay,
                          grad_clip=recipe.grad_clip)


# Flag sets from the reference run scripts (run-fmow-contsoftmax.sh /
# run-inat_2018-contsoftmax.sh: gridcell encoder, 32 frequencies, gelu FFN,
# contsoftmax unsupervised loss) and the released checkpoint's name-encoded
# hyperparameters (model_fmow_gridcell_0.0010_32_0.1000000_1_512_gelu_
# UNSUPER-contsoftmax_0.000050_1.000_1_0.100_TMP1.0000_1.0000_1.0000.pth.tar).
RECIPES: Dict[str, CspRecipe] = {
    "fmow-contsoftmax": CspRecipe(
        name="fmow-contsoftmax",
        model=CspConfig(spa_enc_type="gridcell", num_filts=256, num_classes=62,
                        frequency_num=32, max_radius=360.0, min_radius=0.1,
                        spa_f_act="gelu", num_hidden_layer=1, hidden_dim=512,
                        use_layn=True, skip_connection=True, dropout=0.5),
        train=CspTrainConfig(unsuper_loss="contsoftmax", cnn_feat_dim=2048,
                             num_neg_rand_loc=1, neg_rand_type="spherical",
                             unsuper_temp_inbatch=1.0, unsuper_temp_negloc=1.0,
                             unsuper_temp_simcse=1.0, rand_sample_weight=1.0,
                             simcse_weight=0.1),
        lr=5e-5, weight_decay=1e-3,
    ),
    "inat2018-contsoftmax": CspRecipe(
        name="inat2018-contsoftmax",
        model=CspConfig(spa_enc_type="gridcell", num_filts=256,
                        num_classes=8142, frequency_num=32, max_radius=360.0,
                        min_radius=0.1, spa_f_act="gelu", num_hidden_layer=1,
                        hidden_dim=512, use_layn=True, skip_connection=True,
                        dropout=0.5),
        train=CspTrainConfig(unsuper_loss="contsoftmax", cnn_feat_dim=2048,
                             num_neg_rand_loc=1, neg_rand_type="spherical",
                             rand_sample_weight=1.0, simcse_weight=0.1),
        lr=5e-5, weight_decay=1e-3,
    ),
}


def make_run_name(recipe: CspRecipe) -> str:
    """Hyperparameter-encoded model file name, in the reference's style
    (`csp/main/utils.py:26-156`)."""
    m, t = recipe.model, recipe.train
    return (f"model_{recipe.name.split('-')[0]}_{m.spa_enc_type}_"
            f"{recipe.lr:.4f}_{m.frequency_num}_{m.min_radius:.7f}_"
            f"{m.num_hidden_layer}_{m.hidden_dim}_{m.spa_f_act}_"
            f"UNSUPER-{t.unsuper_loss}_{recipe.weight_decay:.6f}_"
            f"{t.rand_sample_weight:.3f}_{t.num_neg_rand_loc}_"
            f"{t.simcse_weight:.3f}_TMP{t.unsuper_temp_inbatch:.4f}_"
            f"{t.unsuper_temp_negloc:.4f}_{t.unsuper_temp_simcse:.4f}")
