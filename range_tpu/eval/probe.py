"""Downstream linear-probe evaluation.

Counterpart of `range/utils/evaluate.py:14-48`: load the npz embedding dumps
(or take arrays directly), MinMax-scale, ridge classify/regress with CV over
alphas (0.1, 1, 10), return the validation score.  The solve runs on TPU
(ops/ridge.py); pass ``backend='sklearn'`` for the bit-exact sklearn
reference path (sklearn is an eval-only dependency)."""

from __future__ import annotations

import os
import numpy as np

from ..ops.ridge import ridge_probe

CLASSIFICATION_TASKS = ("ecoregion", "biome", "country", "ocean")  # + checker*


def task_kind(task_name: str) -> str:
    """Reference dispatch rule (evaluate.py:29-36); inat raises there too."""
    if (task_name in CLASSIFICATION_TASKS) or ("checker" in task_name):
        return "classification"
    if "inat" in task_name:
        raise NotImplementedError("Inat evaluation not implemented")
    return "regression"


def evaluate_arrays(train_emb, train_y, val_emb, val_y, task_name: str,
                    backend: str = "tpu") -> float:
    kind = task_kind(task_name)
    if backend == "sklearn":
        from sklearn.linear_model import RidgeCV, RidgeClassifierCV
        from sklearn.preprocessing import MinMaxScaler

        scaler = MinMaxScaler()
        tr = scaler.fit_transform(train_emb)
        va = scaler.transform(val_emb)
        if kind == "classification":
            clf = RidgeClassifierCV(alphas=(0.1, 1.0, 10.0), cv=10)
        else:
            clf = RidgeCV(alphas=(0.1, 1.0, 10.0), cv=3)
        clf.fit(tr, train_y)
        return float(clf.score(va, val_y))
    return ridge_probe(train_emb, train_y, val_emb, val_y, kind)


def evaluate_npz(embeddings_dir: str, model_name: str, task_name: str,
                 backend: str = "tpu") -> float:
    """Mirrors `evaluate_npz` (evaluate.py:14-48): reads
    {task}_{train,val}.npz under embeddings_dir/model_name."""
    base = os.path.join(embeddings_dir, model_name)
    train_path = os.path.join(base, f"{task_name}_train.npz")
    val_path = os.path.join(base, f"{task_name}_val.npz")
    assert os.path.exists(train_path), f"Train embeddings file does not exist: {train_path}"
    assert os.path.exists(val_path), f"Val embeddings file does not exist: {val_path}"
    tr = np.load(train_path, allow_pickle=True)
    va = np.load(val_path, allow_pickle=True)
    return evaluate_arrays(tr["embeddings"], tr["y"], va["embeddings"], va["y"],
                           task_name, backend=backend)
