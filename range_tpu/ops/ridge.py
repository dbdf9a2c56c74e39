"""Ridge classification/regression probes on TPU (closed form, CV over alpha).

Counterpart of the reference probe (`range/utils/evaluate.py:29-47`):
MinMaxScaler + RidgeClassifierCV(alphas=(0.1, 1, 10), cv=10) for
classification tasks and RidgeCV(alphas, cv=3) for regression, re-designed
for TPU: one Gram matrix G = XtX / C = XtY in f32 on the MXU, k-fold CV by
*subtracting* each fold's Gram contribution (no per-fold data copies), and a
single eigendecomposition per fold reused across all alphas
(W = V diag(1/(lam+alpha)) Vt C).

Semantics matched to sklearn: labels one-hot encoded to +-1 (binary: one
column), fit_intercept via column/target centering, accuracy scored by
argmax of decision values (sign for binary), regression scored by R^2.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Alphas = (0.1, 1.0, 10.0)


def minmax_scale(train_X: np.ndarray, val_X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """sklearn MinMaxScaler semantics incl. constant-column handling
    (evaluate.py:39-43)."""
    mn = train_X.min(0)
    mx = train_X.max(0)
    scale = mx - mn
    scale = np.where(scale == 0, 1.0, scale)
    return (train_X - mn) / scale, (val_X - mn) / scale


def _binarize(y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """LabelBinarizer(neg_label=-1): [n, K] for K>2, [n, 1] for binary."""
    classes = np.unique(y)
    if classes.size == 2:
        Y = np.where(y[:, None] == classes[1], 1.0, -1.0)
    else:
        Y = np.where(y[:, None] == classes[None, :], 1.0, -1.0)
    return Y.astype(np.float32), classes


@functools.partial(jax.jit, static_argnames=("n_folds", "alphas"))
def _cv_pick_alpha(X, Y, fold_ids, n_folds: int, alphas: Tuple[float, ...]):
    """Returns per-alpha mean CV score (sum of squared prediction errors for
    regression-style selection — lower is better), computed fold-by-fold via
    Gram subtraction."""
    n, f = X.shape
    Xc = X
    G = Xc.T @ Xc  # [f, f]
    C = Xc.T @ Y  # [f, K]
    ones = jnp.ones((n, 1), X.dtype)
    sx = Xc.T @ ones  # [f, 1] column sums
    sy = Y.T @ ones  # [K, 1]

    def fold_score(fold):
        m = (fold_ids == fold)
        mf = m.astype(X.dtype)[:, None]
        n_in = jnp.sum(1.0 - mf)
        Xv = Xc * mf  # held-out rows (others zeroed)
        Yv = Y * mf
        G_out = Xv.T @ Xv
        C_out = Xv.T @ Yv
        G_tr = G - G_out
        C_tr = C - C_out
        # centering (fit_intercept): mean over training rows
        sx_tr = sx - Xv.T @ ones
        sy_tr = sy - Yv.T @ ones
        mu_x = (sx_tr / n_in)[:, 0]
        mu_y = (sy_tr / n_in)[:, 0]
        Gc = G_tr - jnp.outer(mu_x, mu_x) * n_in
        Cc = C_tr - jnp.outer(mu_x, mu_y) * n_in
        lam, V = jnp.linalg.eigh(Gc)
        VtC = V.T @ Cc

        def score_alpha(alpha):
            W = V @ (VtC / (lam + alpha)[:, None])  # [f, K]
            b = mu_y - W.T @ mu_x
            pred = Xc @ W + b  # [n, K] (all rows; we mask to held-out)
            err = (pred - Y) ** 2
            return jnp.sum(err * mf)

        return jnp.stack([score_alpha(a) for a in alphas])

    scores = jnp.stack([fold_score(i) for i in range(n_folds)])  # [folds, A]
    return jnp.sum(scores, axis=0)


@functools.partial(jax.jit, static_argnames=())
def _fit_full(X, Y, alpha):
    n = X.shape[0]
    mu_x = jnp.mean(X, axis=0)
    mu_y = jnp.mean(Y, axis=0)
    Xc = X - mu_x
    Yc = Y - mu_y
    G = Xc.T @ Xc + alpha * jnp.eye(X.shape[1], dtype=X.dtype)
    W = jnp.linalg.solve(G, Xc.T @ Yc)
    b = mu_y - W.T @ mu_x
    return W, b


def ridge_probe(train_X: np.ndarray, train_y: np.ndarray, val_X: np.ndarray,
                val_y: np.ndarray, kind: str,
                alphas: Sequence[float] = Alphas,
                cv: int | None = None, seed: int = 0,
                dtype=jnp.float32) -> float:
    """Full probe: scale, CV-select alpha, fit, score on val.

    kind: 'classification' (returns accuracy, cv default 10 — evaluate.py:31)
          or 'regression' (returns R^2, cv default 3 — evaluate.py:36).
    """
    if cv is None:
        cv = 10 if kind == "classification" else 3
    train_X, val_X = minmax_scale(np.asarray(train_X, np.float64),
                                  np.asarray(val_X, np.float64))
    X = jnp.asarray(train_X, dtype)
    Xv = jnp.asarray(val_X, dtype)
    if kind == "classification":
        Y, classes = _binarize(train_y)
    else:
        Y = np.asarray(train_y, np.float64)[:, None].astype(np.float32)
        classes = None
    Yj = jnp.asarray(Y, dtype)

    n = X.shape[0]
    cv = min(cv, n)
    fold_ids = jnp.asarray(np.random.default_rng(seed).permutation(n) % cv)
    sse = np.asarray(_cv_pick_alpha(X, Yj, fold_ids, cv, tuple(alphas)))
    alpha = float(alphas[int(np.argmin(sse))])

    W, b = _fit_full(X, Yj, jnp.asarray(alpha, dtype))
    dec = np.asarray(Xv @ W + b)
    if kind == "classification":
        if classes.size == 2:
            pred = classes[(dec[:, 0] > 0).astype(int)]
        else:
            pred = classes[dec.argmax(1)]
        return float(np.mean(pred == np.asarray(val_y)))
    # R^2
    y = np.asarray(val_y, np.float64)
    yhat = dec[:, 0].astype(np.float64)
    ss_res = float(np.sum((y - yhat) ** 2))
    ss_tot = float(np.sum((y - y.mean()) ** 2))
    return 1.0 - ss_res / ss_tot
