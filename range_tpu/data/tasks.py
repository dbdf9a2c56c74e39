"""Downstream evaluation task datasets (CSV -> numpy arrays).

Counterpart of `range/evaluation/evaldatasets.py` + the registry in
`range/utils/load_dataset.py:9-83`, torch-free: each task loads to a
``GeoTask`` of plain numpy arrays — (lon, lat) coords and labels — and the
split helper reproduces the reference's seeded 80/20 random split semantics
(`load_dataset.py:10-14`; we use a numpy permutation with the same seed — the
exact element order of torch.Generator cannot be reproduced without torch,
which is documented as an accepted divergence).

Column schemas match the reference datasets exactly (see each loader).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

from .checkerboard import CheckerDataset


@dataclasses.dataclass
class GeoTask:
    name: str
    coords: np.ndarray  # [N, 2] (lon, lat) degrees, float64
    labels: np.ndarray  # [N] int64 (classification) or float64 (regression)
    num_classes: int  # 0 => regression
    kind: str  # 'classification' | 'regression'


def _task(name, lon, lat, labels, classification):
    coords = np.stack([np.asarray(lon, np.float64), np.asarray(lat, np.float64)], 1)
    if classification:
        labels = np.asarray(labels)
        if labels.dtype.kind in "OUSb":  # factorize strings like pd.factorize
            import pandas as pd

            labels, _ = pd.factorize(labels)
        labels = labels.astype(np.int64)
        ncls = int(np.unique(labels).size)
        return GeoTask(name, coords, labels, ncls, "classification")
    return GeoTask(name, coords, np.asarray(labels, np.float64), 0, "regression")


def _read_csv(path):
    import pandas as pd

    return pd.read_csv(path)


def load_biome(eval_dir: str) -> GeoTask:
    """ecoregion_{train,val}.csv concat, BIOME_NAME factorized, X/Y coords
    (`evaldatasets.py:10-32`)."""
    import pandas as pd

    df = pd.concat([
        _read_csv(os.path.join(eval_dir, "ecoregion_train.csv")),
        _read_csv(os.path.join(eval_dir, "ecoregion_val.csv")),
    ])
    df = df.dropna(subset=["BIOME_NAME"]).reset_index(drop=True)
    return _task("biome", df["X"], df["Y"], df["BIOME_NAME"], True)


def load_ecoregion(eval_dir: str) -> GeoTask:
    """Same files, ECO_NAME labels (`evaldatasets.py:35-57`)."""
    import pandas as pd

    df = pd.concat([
        _read_csv(os.path.join(eval_dir, "ecoregion_train.csv")),
        _read_csv(os.path.join(eval_dir, "ecoregion_val.csv")),
    ])
    df = df.dropna(subset=["ECO_NAME"]).reset_index(drop=True)
    return _task("ecoregion", df["X"], df["Y"], df["ECO_NAME"], True)


def load_country(eval_dir: str) -> GeoTask:
    """country.csv: country/lat/lon (`evaldatasets.py:96-113`)."""
    df = _read_csv(os.path.join(eval_dir, "country.csv"))
    df = df.dropna(subset=["country", "lat", "lon"]).reset_index(drop=True)
    return _task("country", df["lon"], df["lat"], df["country"], True)


def load_ocean(eval_dir: str) -> Tuple[GeoTask, GeoTask]:
    """land_ocean_{train,test}.csv with a 'land' label — pre-split upstream
    (`evaldatasets.py:115-132`, `load_dataset.py:26-31`)."""
    out = []
    for split in ["train", "test"]:
        df = _read_csv(os.path.join(eval_dir, f"land_ocean_{split}.csv"))
        df = df.dropna(subset=["land", "lat", "lon"]).reset_index(drop=True)
        out.append(_task("ocean", df["lon"], df["lat"], df["land"], True))
    return tuple(out)


def load_temperature(eval_dir: str) -> GeoTask:
    """temp.csv: meanT at Lon/Lat (`evaldatasets.py:151-168`)."""
    df = _read_csv(os.path.join(eval_dir, "temp.csv"))
    df = df.dropna(subset=["meanT"]).reset_index(drop=True)
    return _task("temperature", df["Lon"], df["Lat"], df["meanT"], False)


def load_housing(eval_dir: str) -> GeoTask:
    """housing.csv: median_house_value (`evaldatasets.py:171-188`)."""
    df = _read_csv(os.path.join(eval_dir, "housing.csv"))
    df = df.dropna(subset=["median_house_value"]).reset_index(drop=True)
    return _task("housing", df["longitude"], df["latitude"],
                 df["median_house_value"], False)


def load_elevation(eval_dir: str) -> GeoTask:
    """elevation.csv (`evaldatasets.py:191-208`)."""
    df = _read_csv(os.path.join(eval_dir, "elevation.csv"))
    df = df.dropna(subset=["elevation"]).reset_index(drop=True)
    return _task("elevation", df["lon"], df["lat"], df["elevation"], False)


def load_population(eval_dir: str) -> GeoTask:
    """population.csv with log1p labels (`evaldatasets.py:233-251`)."""
    df = _read_csv(os.path.join(eval_dir, "population.csv"))
    df = df.dropna(subset=["population"]).reset_index(drop=True)
    return _task("population", df["lon"], df["lat"],
                 np.log1p(df["population"].to_numpy(float)), False)


def load_era5(eval_dir: str, group: str = "air_temp_m") -> GeoTask:
    """ERA5_Land_Clipped_2020.csv, one column group (`evaldatasets.py:211-229`)."""
    df = _read_csv(os.path.join(eval_dir, "ERA5_Land_Clipped_2020.csv"))
    df = df.dropna(subset=[group]).reset_index(drop=True)
    return _task(f"era5-{group}", df["Longitude"], df["Latitude"], df[group], False)


def load_inat(eval_dir: str) -> Tuple[GeoTask, GeoTask]:
    """inat2018_{train,val}.csv (`evaldatasets.py:59-94`): pre-split; train
    drops the stray index column, val keeps lon/lat/class."""
    import pandas as pd

    tr = _read_csv(os.path.join(eval_dir, "inat2018_train.csv"))
    if "Unnamed: 0" in tr.columns:
        tr = tr.drop(columns=["Unnamed: 0"])
    va = _read_csv(os.path.join(eval_dir, "inat2018_val.csv"))[["lon", "lat", "class"]]
    return (
        _task("inat_1", tr["lon"], tr["lat"], tr["class"].to_numpy(), True),
        _task("inat_1", va["lon"], va["lat"], va["class"].to_numpy(), True),
    )


def load_csv_points(path: str) -> GeoTask:
    """Generic lon/lat csv, index as label (`evaldatasets.py:134-148`)."""
    df = _read_csv(path)
    return GeoTask("csv_data",
                   np.stack([df["lon"].to_numpy(float), df["lat"].to_numpy(float)], 1),
                   df.index.to_numpy(np.int64), 0, "classification")


def split_task(task: GeoTask, train_frac: float = 0.8, seed: int = 42
               ) -> Tuple[GeoTask, GeoTask]:
    """Seeded random split (reference: torch random_split [0.8, 0.2] with
    Generator(42), `load_dataset.py:10-14`)."""
    n = task.coords.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    k = int(round(train_frac * n))
    tr, va = perm[:k], perm[k:]

    def sub(idx):
        return GeoTask(task.name, task.coords[idx], task.labels[idx],
                       task.num_classes, task.kind)

    return sub(tr), sub(va)


def get_dataset(task_name: str, eval_dir: str = ".", seed: int = 42
                ) -> Tuple[GeoTask, GeoTask, int]:
    """Task registry: (train, val, num_classes).  Mirrors
    `utils/load_dataset.py:9-83` (including the pre-split ocean/inat tasks
    and checker_<K> synthetic tasks)."""
    presplit = {"ocean": lambda: load_ocean(eval_dir),
                "inat_1": lambda: load_inat(eval_dir)}
    if task_name in presplit:
        tr, va = presplit[task_name]()
        return tr, va, tr.num_classes
    if task_name.startswith("checker"):
        num_support = int(task_name.split("_")[-1])
        ds = CheckerDataset(num_samples=10000, num_classes=16,
                            num_support=num_support)
        tr = GeoTask(task_name, ds.train[0], ds.train[1].astype(np.int64), 16,
                     "classification")
        ev = GeoTask(task_name, ds.evalu[0], ds.evalu[1].astype(np.int64), 16,
                     "classification")
        return tr, ev, 16
    if task_name.startswith("era5"):
        group = task_name.split("-")[-1] if "-" in task_name else "air_temp_m"
        tr, va = split_task(load_era5(eval_dir, group), seed=seed)
        return tr, va, 0
    loaders = {
        "biome": load_biome,
        "ecoregion": load_ecoregion,
        "country": load_country,
        "temperature": load_temperature,
        "housing": load_housing,
        "elevation": load_elevation,
        "population": load_population,
    }
    if task_name not in loaders:
        raise ValueError(f"Task name not recognized: {task_name}")
    task = loaders[task_name](eval_dir)
    tr, va = split_task(task, seed=seed)
    return tr, va, task.num_classes
