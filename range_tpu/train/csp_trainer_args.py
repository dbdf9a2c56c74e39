"""The full CSP trainer argument surface + model-file run-name encoding.

The reference trainer exposes ~60 CLI flags (`csp/main/trainer.py:25-223`)
and encodes the hyperparameters of a run into its model/checkpoint file name
(`csp/main/utils.py:26-156`, assembled at `trainer.py:399-425` after the
T/F-string normalization of `trainer.py:225-246`).  The shipped RECIPES
(csp_recipes.py) cover the two published run scripts; this module makes
ARBITRARY reference invocations expressible:

  * `CspTrainerArgs` — every reference flag, same names, same defaults
    (booleans kept as 'T'/'F' strings exactly like the reference CLI);
  * `make_parser()` / `parse_args()` — an argparse accepting the reference's
    run-script flag lines verbatim;
  * `normalized()` — `update_params` semantics (T/F -> bool, meta_type
    cleared for non-birdsnap/nabirds datasets);
  * `make_model_file_param_args` / `model_file_names` — the run-name
    encoding, byte-compatible with the reference so released checkpoints'
    names can be generated/parsed;
  * `build(args)` — (CspConfig, CspTrainConfig, CspRecipe) from any flag
    combination, bridging to the JAX training stack (train/csp.py).
"""

from __future__ import annotations

import dataclasses
import decimal
from argparse import ArgumentParser
from typing import Any, Dict, Optional

from ..models.csp import CspConfig
from .csp import CspTrainConfig

# datasets.py:33-303 (load_dataset per-branch constants)
DATASET_NUM_CLASSES: Dict[str, int] = {
    "inat_2017": 5089,
    "inat_2018": 8142,
    "fmow": 62,
    "birdsnap": 500,
    "nabirds": 555,
    "yfcc": 100,
    "checkerboard": 10,
}

_TF_FLAGS = [
    # trainer.py:230-236 update_params' boolean list
    "load_val_op", "use_layn", "skip_connection", "spa_enc_use_postmat",
    "balanced_train_loader", "use_date_feats", "load_cnn_predictions",
    "load_cnn_features", "load_cnn_features_train", "do_unsuper_train",
    "load_unsuper_model", "do_super_train", "load_super_model", "load_img",
    "do_epoch_save",
]


@dataclasses.dataclass
class CspTrainerArgs:
    """All reference trainer flags (trainer.py:25-223), reference defaults."""

    # datasets
    unsuper_dataset: str = "inat_2018"
    unsuper_meta_type: str = "ebird_meta"
    dataset: str = "inat_2018"
    meta_type: str = "ebird_meta"
    eval_split: str = "val"
    load_val_op: str = "F"
    cnn_model: str = "inception_v3"
    load_cnn_predictions: str = "F"
    load_cnn_features: str = "F"
    load_cnn_features_train: str = "F"
    load_img: str = "F"
    inat2018_resolution: str = "standard"
    cnn_pred_type: str = "full"
    device: str = "cuda:0"
    model_dir: str = "../models/"
    num_epochs: int = 30
    num_epochs_unsuper: int = 30
    # space encoder
    spa_enc_type: str = "gridcell"
    frequency_num: int = 32
    max_radius: float = 1.0
    min_radius: float = 0.000001
    num_hidden_layer: int = 1
    hidden_dim: int = 512
    num_rbf_anchor_pts: int = 200
    rbf_kernal_size: float = 1.0
    loc_encode: str = "encode_cos_sin"
    num_filts: int = 256
    freq_init: str = "geometric"
    spa_f_act: str = "relu"
    map_range: tuple = (-180.0, 180.0, -90.0, 90.0)
    use_layn: str = "T"
    skip_connection: str = "T"
    spa_enc_use_postmat: str = "T"
    # date encoder
    use_date_feats: str = "F"
    date_encode: str = "encode_cos_sin"
    # loss
    train_loss: str = "full_loss"
    neg_rand_type: str = "spherical"
    train_sample_ratio: float = 1.0
    train_sample_method: str = "stratified-fix"
    # unsupervised loss
    unsuper_loss: str = "none"
    num_neg_rand_loc: int = 1
    rand_sample_weight: float = 1.0
    simcse_weight: float = 0.0
    unsuper_lr: float = 0.001
    do_unsuper_train: str = "F"
    load_unsuper_model: str = "F"
    unsuper_temp_inbatch: float = 1.0
    unsuper_temp_negloc: float = 1.0
    unsuper_temp_simcse: float = 1.0
    unsuper_eval_frequency: int = 10
    # training
    lr: float = 0.001
    lr_decay: float = 0.98
    weight_decay: float = 0.0
    dropout: float = 0.5
    batch_size: int = 1024
    log_frequency: int = 50
    max_num_exs_per_class: int = 100
    balanced_train_loader: str = "T"
    eval_frequency: int = 5
    unsuper_save_frequency: int = 5
    load_super_model: str = "F"
    do_super_train: str = "T"
    do_epoch_save: str = "F"

    def normalized(self) -> Dict[str, Any]:
        """`update_params` semantics (trainer.py:225-246): 'T'/'F' -> bool,
        meta_type cleared unless dataset is birdsnap/nabirds."""
        p = dataclasses.asdict(self)
        if p["dataset"] not in ("birdsnap", "nabirds"):
            p["meta_type"] = ""
        for var in _TF_FLAGS:
            if p[var] == "T":
                p[var] = True
            elif p[var] == "F":
                p[var] = False
            else:
                raise ValueError(f"Unknown {var}={p[var]}")
        return p


def make_parser() -> ArgumentParser:
    """Argparse mirroring the reference CLI flag-for-flag, so the published
    run scripts' argument lines parse verbatim."""
    parser = ArgumentParser()
    for f in dataclasses.fields(CspTrainerArgs):
        if f.name == "map_range":
            parser.add_argument("--map_range", nargs="+", type=float,
                                default=list(f.default))
            continue
        ftype = type(f.default)
        parser.add_argument(f"--{f.name}", type=ftype, default=f.default)
    return parser


def parse_args(argv=None) -> CspTrainerArgs:
    ns = make_parser().parse_args(argv)
    kw = vars(ns)
    kw["map_range"] = tuple(kw["map_range"])
    return CspTrainerArgs(**kw)


_UNSUPER_LOSSES = ("l2regress", "imgcontloss", "imgcontlossnolocneg",
                   "imgcontlosssimcse", "contsoftmax", "contsoftmaxsym")


def get_train_sample_ratio_tag(train_sample_ratio: float,
                               train_sample_method: str) -> str:
    """data_utils.py:27-35."""
    if train_sample_method == "stratified-fix":
        return f"ratio{train_sample_ratio:.3f}"
    return f"ratio{train_sample_ratio:.3f}-{train_sample_method}"


def make_model_file_param_args(p: Dict[str, Any], spa_enc_type: str,
                               get_unsuper_model_path: bool = False
                               ) -> Optional[str]:
    """Hyperparameter run-name encoding (`csp/main/utils.py:26-156`), same
    byte-level output: lr precision switches on its decimal exponent; BATCH/
    EMB/DROPOUT/WDECAY tags appear only off-default; rff/rbf add kernel
    params; the unsupervised-loss tag nests by loss family."""
    lr_decimal = decimal.Decimal(str(p["lr"])).normalize().as_tuple().exponent
    lr_f = 4 if lr_decimal >= -4 else 8
    cnnmodel_name = ("" if (p["dataset"] == "inat_2018"
                            and p["cnn_model"] == "inception_v3")
                     else p["cnn_model"] + "_")
    param_args = (f"{cnnmodel_name}{p['lr']:.{lr_f}f}_{p['frequency_num']:d}_"
                  f"{p['min_radius']:.7f}_{p['num_hidden_layer']:d}_"
                  f"{p['hidden_dim']:d}")
    if p["batch_size"] != 1024:
        param_args += f"_BATCH{p['batch_size']:d}"
    if p["num_filts"] != 256:
        param_args += f"_EMB{p['num_filts']:d}"
    if spa_enc_type == "rff":
        param_args += f"_{p['rbf_kernal_size']:.1f}"
    if spa_enc_type == "rbf":
        param_args += f"_{p['num_rbf_anchor_pts']:d}_{p['rbf_kernal_size']:.1f}"
    if p["dropout"] != 0.5:
        param_args += f"_DROPOUT{p['dropout']:.1f}"
    if p["weight_decay"] != 0:
        param_args += f"_WDECAY{p['weight_decay']:.6f}"

    unsuper_loss = p["unsuper_loss"]

    def _contrastive_suffix(tag: str) -> str:
        if unsuper_loss in ("imgcontloss", "imgcontlosssimcse", "contsoftmax",
                            "contsoftmaxsym"):
            tag += (f"_{p['rand_sample_weight']:.3f}_"
                    f"{p['num_neg_rand_loc']:d}")
            if unsuper_loss in ("imgcontlosssimcse", "contsoftmax",
                                "contsoftmaxsym"):
                tag += f"_{p['simcse_weight']:.3f}"
                if "contsoftmax" in unsuper_loss:
                    tag += (f"_TMP{p['unsuper_temp_inbatch']:.4f}_"
                            f"{p['unsuper_temp_negloc']:.4f}_"
                            f"{p['unsuper_temp_simcse']:.4f}")
        return tag

    if get_unsuper_model_path:
        if unsuper_loss == "none":
            return None
        if unsuper_loss not in _UNSUPER_LOSSES:
            raise ValueError(f"Unknown unsuper_loss={unsuper_loss}")
        # NOTE the reference formats unsuper_lr with '{:6f}' (width-6, not
        # precision) here vs '{:.6f}' in the supervised branch — reproduced
        tag = (f"_{p['spa_f_act']}_UNSUPER-{unsuper_loss}_"
               + format(p["unsuper_lr"], "6f"))
        tag = _contrastive_suffix(tag)
    else:
        ratio_tag = get_train_sample_ratio_tag(p["train_sample_ratio"],
                                               p["train_sample_method"])
        if unsuper_loss == "none":
            if p["train_sample_ratio"] == 1.0:
                tag = ("" if p["spa_f_act"] == "relu"
                       else f"_{p['spa_f_act']}")
            else:
                tag = f"_{p['spa_f_act']}_{unsuper_loss}_{ratio_tag}"
        elif unsuper_loss in _UNSUPER_LOSSES:
            tag = (f"_{p['spa_f_act']}_{unsuper_loss}_{ratio_tag}_"
                   f"{p['unsuper_lr']:.6f}")
            tag = _contrastive_suffix(tag)
        else:
            raise ValueError(f"Unknown unsuper_loss={unsuper_loss}")
    return param_args + tag


def model_file_names(args: CspTrainerArgs) -> Dict[str, Optional[str]]:
    """The trainer's derived artifact paths (trainer.py:399-441):
    {'model_file_name', 'unsuper_model_file_name', 'log_file_name'}."""
    p = args.normalized()
    out: Dict[str, Optional[str]] = {}
    for key, unsup in (("unsuper_model_file_name", True),
                       ("model_file_name", False)):
        pa = make_model_file_param_args(p, p["spa_enc_type"],
                                        get_unsuper_model_path=unsup)
        if pa is None:
            out[key] = None
        elif p["meta_type"] == "":
            out[key] = (p["model_dir"] + f"model_{p['dataset']}_"
                        f"{p['spa_enc_type']}_{pa}.pth.tar")
        else:
            out[key] = (p["model_dir"] + f"model_{p['dataset']}_"
                        f"{p['meta_type']}_{p['spa_enc_type']}_{pa}.pth.tar")
    mf = out["model_file_name"]
    out["log_file_name"] = (mf.replace(".pth.tar", ".log")
                            if mf is not None else None)
    return out


def build(args: CspTrainerArgs, *, num_classes: Optional[int] = None,
          cnn_feat_dim: int = 2048):
    """(CspConfig, CspTrainConfig, CspRecipe) from any flag combination —
    the bridge from the reference flag surface to the JAX training stack
    (model factory utils.py:694-728 + trainer loop semantics)."""
    from .csp_recipes import CspRecipe

    p = args.normalized()
    if num_classes is None:
        num_classes = DATASET_NUM_CLASSES.get(p["dataset"], 1)
    model = CspConfig(
        spa_enc_type=p["spa_enc_type"],
        rbf_kernal_size=p["rbf_kernal_size"],
        num_filts=p["num_filts"],
        num_classes=num_classes,
        frequency_num=p["frequency_num"],
        max_radius=p["max_radius"],
        min_radius=p["min_radius"],
        freq_init=p["freq_init"],
        spa_f_act=p["spa_f_act"],
        num_hidden_layer=p["num_hidden_layer"],
        hidden_dim=p["hidden_dim"],
        use_layn=p["use_layn"],
        skip_connection=p["skip_connection"],
        dropout=p["dropout"],
        map_range=tuple(p["map_range"]),
        use_post_mat=p["spa_enc_use_postmat"],
    )
    train = CspTrainConfig(
        unsuper_loss=(p["unsuper_loss"] if p["unsuper_loss"] != "none"
                      else "contsoftmax"),
        cnn_feat_dim=cnn_feat_dim,
        num_neg_rand_loc=p["num_neg_rand_loc"],
        neg_rand_type=p["neg_rand_type"],
        unsuper_temp_inbatch=p["unsuper_temp_inbatch"],
        unsuper_temp_negloc=p["unsuper_temp_negloc"],
        unsuper_temp_simcse=p["unsuper_temp_simcse"],
        rand_sample_weight=p["rand_sample_weight"],
        simcse_weight=p["simcse_weight"],
    )
    lr = p["unsuper_lr"] if p["do_unsuper_train"] else p["lr"]
    epochs = (p["num_epochs_unsuper"] if p["do_unsuper_train"]
              else p["num_epochs"])
    recipe = CspRecipe(
        name=f"{p['dataset']}-{p['unsuper_loss']}",
        model=model, train=train, lr=lr,
        weight_decay=p["weight_decay"], epochs=epochs,
        batch_size=p["batch_size"], lr_decay=p["lr_decay"],
    )
    return model, train, recipe
