"""iNaturalist geo-prior evaluation data pipeline.

Counterpart of `range/evaluation/inat/` (datasets.py loaders, dataloader.py
batching, make_df.py exporters): loads geo_prior-style observation files
(paired *_locations.json metadata + COCO-style annotation json), sparse CNN
prediction matrices, and dense CNN feature arrays, all into plain numpy —
then exports the reference npz/csv artifacts that downstream probes consume
(`inat2018_{train,val}.csv` read by `evaldatasets.py:59-94`).

The actual iNat releases are not redistributable; every loader is file-path
driven and exercised in tests with synthetic files of the same schema.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, Optional

import numpy as np


def load_sparse_feats(file_path: str, invert: bool = False) -> np.ndarray:
    """Dense-ify a scipy sparse prediction matrix
    (`csp/main/datasets.py:401-408`); `invert` returns logits."""
    from scipy import sparse

    feats = np.asarray(sparse.load_npz(file_path).todense(), dtype=np.float32)
    if invert:
        eps = 1e-4
        feats = np.clip(feats, eps, 1.0 - eps)
        feats = np.log(feats / (1.0 - feats))
    return feats


def load_inat_data(ip_dir: str, loc_file_name: str, ann_file_name: str,
                   remove_empty: bool = False):
    """Join observation metadata with annotations.

    Mirrors `evaluation/inat/datasets.py:485-602`: `loc_file_name` is a list
    of {id, lon, lat, date_c, user_id}; `ann_file_name` is COCO-style
    {images: [{id}], annotations: [{image_id, category_id}]}.  '_large' loc
    files carry class labels inline.

    Returns (locs [N,2], classes [N], users [N], dates [N], keep_inds [N]).
    """
    with open(os.path.join(ip_dir, loc_file_name)) as f:
        loc_data = json.load(f)
    loc_by_id = {ll["id"]: ll for ll in loc_data}

    if "_large" in loc_file_name:
        locs = [[ll["lon"], ll["lat"]] for ll in loc_data]
        dates = [ll["date_c"] for ll in loc_data]
        classes = [ll["class"] for ll in loc_data]
        users = [ll["user_id"] for ll in loc_data]
        keep = np.arange(len(locs))
    else:
        with open(os.path.join(ip_dir, ann_file_name)) as f:
            ann = json.load(f)
        ids = [img["id"] for img in ann["images"]]
        cls_map = {a["image_id"]: a["category_id"] for a in ann["annotations"]}
        locs, classes, users, dates, keep = [], [], [], [], []
        for i, img_id in enumerate(ids):
            meta = loc_by_id[img_id]
            if remove_empty and (meta["lon"] is None or meta["user_id"] is None):
                continue
            locs.append([meta["lon"], meta["lat"]]
                        if meta["lon"] is not None else [np.nan, np.nan])
            users.append(meta["user_id"] if meta["user_id"] is not None else -1)
            dates.append(meta.get("date_c", 0.0))
            classes.append(cls_map[img_id])
            keep.append(i)
        keep = np.asarray(keep)
    return (np.asarray(locs, np.float64), np.asarray(classes, np.int64),
            np.asarray(users, np.int64), np.asarray(dates, np.float64), keep)


@dataclasses.dataclass
class InatDataset:
    """One split's arrays + optional CNN predictions/features."""

    locs: np.ndarray
    classes: np.ndarray
    users: np.ndarray
    dates: np.ndarray
    preds: Optional[np.ndarray] = None
    feats: Optional[np.ndarray] = None


def load_dataset(data_dir: str, year: str = "2018", eval_split: str = "val",
                 remove_invalid: bool = True, load_cnn_predictions: bool = False,
                 load_cnn_features: bool = False) -> Dict[str, InatDataset]:
    """High-level loader mirroring `evaluation/inat/datasets.py:16-120`'s
    inat_2017/2018 branches (standard-resolution inception features)."""
    splits = {}
    for split, ann in [("train", f"train{year}.json"),
                       (eval_split, f"{eval_split}{year}.json")]:
        locs, classes, users, dates, keep = load_inat_data(
            data_dir, f"{split}{year}_locations.json", ann, remove_invalid)
        ds = InatDataset(locs, classes, users, dates)
        # CNN prediction/feature rows follow the ORIGINAL image order; align
        # them with the kept observations (the reference applies
        # val_preds[val_inds, :], csp/main/datasets.py:360)
        if split == eval_split and load_cnn_predictions:
            preds = load_sparse_feats(os.path.join(
                data_dir, "features_inception",
                f"inat{year}_{eval_split}_preds_sparse.npz"))
            ds.preds = preds[keep] if remove_invalid else preds
        if split == eval_split and load_cnn_features:
            feats = np.load(os.path.join(
                data_dir, "features_inception",
                f"inat{year}_{eval_split}_net_feats.npy"))
            ds.feats = feats[keep] if remove_invalid else feats
        splits[split] = ds
    return splits


def batches(ds: InatDataset, batch_size: int, with_features: bool = False
            ) -> Iterator[dict]:
    """Batched iteration (the torch `LocationDataLoader`'s role,
    `evaluation/inat/dataloader.py:10-41`) as plain numpy dicts."""
    n = ds.locs.shape[0]
    for s in range(0, n, batch_size):
        batch = {
            "loc_feat": ds.locs[s:s + batch_size],
            "loc_class": ds.classes[s:s + batch_size],
            "user": ds.users[s:s + batch_size],
        }
        if with_features and ds.feats is not None:
            batch["cnn_features"] = ds.feats[s:s + batch_size]
        yield batch


def load_bird_data(ip_dir: str, ann_file_name: str, split_name: str,
                   remove_empty: bool = False, meta_type: str = "orig_meta"):
    """Birdsnap/NABirds-style loader (`csp/main/datasets.py:411-483`): one
    json keyed by split, each entry {valid_image, im_path, class_id,
    orig_meta/ebird_meta: {user_id, lon, lat, date}}.

    Returns (locs [N,2], classes [N], users [N], dates [N], valid_inds [N]).
    """
    with open(os.path.join(ip_dir, ann_file_name)) as f:
        data_orig = json.load(f)
    data = [dd for dd in data_orig[split_name] if dd["valid_image"]]
    classes = np.asarray([dd["class_id"] for dd in data], np.int64)
    users = np.asarray(
        [-1 if dd[meta_type]["user_id"] is None else dd[meta_type]["user_id"]
         for dd in data], np.int64)
    dates = np.asarray([dd[meta_type]["date"] for dd in data], np.float64)
    lon = [dd[meta_type]["lon"] for dd in data]
    lat = [dd[meta_type]["lat"] for dd in data]
    locs = np.stack([np.asarray(lon, np.float64), np.asarray(lat, np.float64)], 1)
    valid = (~np.isnan(locs[:, 0])) & (users >= 0) & (~np.isnan(dates))
    if remove_empty:
        locs, classes, users, dates = (locs[valid], classes[valid],
                                       users[valid], dates[valid])
    return locs, classes, users, dates, valid


def export_csvs(splits: Dict[str, InatDataset], out_dir: str, year: str = "2018"):
    """Write `inat{year}_{split}.csv` (lon, lat, class) — the artifacts the
    probe datasets read (`evaldatasets.py:59-94`, produced upstream by
    `evaluation/inat/make_df.py:5-33`)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for split, ds in splits.items():
        df = pd.DataFrame({"lon": ds.locs[:, 0], "lat": ds.locs[:, 1],
                           "class": ds.classes})
        path = os.path.join(out_dir, f"inat{year}_{split}.csv")
        df.to_csv(path, index=False)
        paths[split] = path
    return paths


def load_yfcc_data(data_dir: str, ann_file_name: str, split_name: str):
    """YFCC100M split loader (`csp/main/datasets.py:579-592`): one csv with
    split/lon/lat/class columns; no user or date features (users all -1,
    dates all 0).  Returns (locs [N,2], classes [N], users [N], dates [N])."""
    import pandas as pd

    da = pd.read_csv(os.path.join(data_dir, ann_file_name))
    rows = da[da["split"] == split_name]
    locs = rows[["lon", "lat"]].values.astype(np.float32)
    classes = rows["class"].values.astype(np.int64)
    users = np.full(locs.shape[0], -1, np.int64)
    dates = np.zeros(locs.shape[0], np.float32)
    return locs, classes, users, dates


def load_csp_dataset(dataset: str, data_dir: str, eval_split: str = "val",
                     remove_invalid: bool = True,
                     load_cnn_predictions: bool = False,
                     meta_type: str = "orig_meta") -> Dict[str, InatDataset]:
    """Dataset dispatch mirroring `csp/main/datasets.py:16-399` for the
    families whose artifacts this framework handles offline:

      * 'inat_2017'/'inat_2018' — paired locations+annotations json
      * 'fmow'     — same schema with {split}_location.json/{split}.json
                     naming and dense `feature_moco/fmow_{split}_preds.npy`
                     (62 classes, :159-210)
      * 'birdsnap'/'nabirds' — single json keyed by split (:230-268)
      * 'yfcc'     — train_test_split.csv + dense
                     `features_inception/YFCC_{split}_preds.npy` (:272-297)

    Returns {'train': InatDataset, eval_split: InatDataset}.
    """
    if dataset.startswith("inat"):
        return load_dataset(data_dir, dataset.split("_")[-1], eval_split,
                            remove_invalid, load_cnn_predictions)
    splits: Dict[str, InatDataset] = {}
    if dataset == "fmow":
        if eval_split == "test":
            raise ValueError("fMOW test split not available upstream")
        for split in ["train", eval_split]:
            locs, classes, users, dates, keep = load_inat_data(
                data_dir, f"{split}_location.json", f"{split}.json",
                remove_invalid)
            ds = InatDataset(locs, classes, users, dates)
            if split == eval_split and load_cnn_predictions:
                preds = np.load(os.path.join(
                    data_dir, "feature_moco", f"fmow_{eval_split}_preds.npy"))
                ds.preds = preds[keep] if remove_invalid else preds
            splits[split] = ds
    elif dataset in ("birdsnap", "nabirds"):
        ann = ("birdsnap_with_loc_2019.json" if dataset == "birdsnap"
               else "nabirds_with_loc_2019.json")
        for split in ["train", eval_split]:
            locs, classes, users, dates, valid = load_bird_data(
                data_dir, ann, split, remove_invalid, meta_type)
            splits[split] = InatDataset(locs, classes, users, dates)
            if split == eval_split and load_cnn_predictions:
                preds = load_sparse_feats(os.path.join(
                    data_dir, "features_inception",
                    f"{dataset}_{eval_split}_preds_sparse.npz"))
                splits[split].preds = preds[valid] if remove_invalid else preds
    elif dataset == "yfcc":
        for split in ["train", eval_split]:
            locs, classes, users, dates = load_yfcc_data(
                data_dir, "train_test_split.csv", split)
            splits[split] = InatDataset(locs, classes, users, dates)
            if split == eval_split and load_cnn_predictions:
                splits[split].preds = np.load(os.path.join(
                    data_dir, "features_inception",
                    f"YFCC_{eval_split}_preds.npy"))
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    return splits
