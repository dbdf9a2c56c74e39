"""K-means on TPU (jitted Lloyd iterations) for bank clustering.

Used to reorder bank rows so that kernel tiles are spatially/semantically
coherent, which is what makes tile-level pruning bounds tight
(bank/clustered.py).  Everything is one jit: assignment is an [N, C] matmul
argmax, updates are one-hot matmuls — no per-cluster Python.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans(key, points: jnp.ndarray, n_clusters: int, iters: int = 10,
           valid: jnp.ndarray | None = None,
           init_points: jnp.ndarray | None = None
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Euclidean k-means.

    Args:
      points: [N, D].
      valid: optional [N] {0,1} mask; invalid rows never update centroids and
        get assignment n_clusters-1... no: they get their argmin cluster but
        with zero weight in updates (callers typically sort them last anyway).
      init_points: optional [n_clusters, D] explicit seed centroids (skips
        the k-means++ scan — its n_clusters sequential steps dominate
        compile+run time for large C; callers with domain structure, e.g. a
        Fibonacci lattice for geographic xyz, seed directly).
    Returns (centroids [C, D], assign [N] int32).
    """
    N, D = points.shape
    if valid is None:
        valid = jnp.ones((N,), jnp.float32)
    valid = valid.astype(jnp.float32)
    if init_points is not None:
        assert init_points.shape == (n_clusters, D), init_points.shape
        centroids = init_points.astype(points.dtype)
    else:
        # k-means++ init (random init merges nearby modes): each next seed
        # is sampled proportional to squared distance from the chosen set.
        k_first, k_seq = jax.random.split(key)
        first = jax.random.categorical(k_first, jnp.log(valid + 1e-30))
        c0 = points[first]

        def pp_step(carry, k):
            d2, prev_c = carry
            d2 = jnp.minimum(d2, jnp.sum((points - prev_c) ** 2, axis=1))
            logits = jnp.log(d2 * valid + 1e-30)
            nxt = jax.random.categorical(k, logits)
            c = points[nxt]
            return (d2, c), c

        keys = jax.random.split(k_seq, n_clusters - 1)
        init_d2 = jnp.full((N,), jnp.inf)
        (_, _), rest = jax.lax.scan(pp_step, (init_d2, c0), keys)
        centroids = jnp.concatenate([c0[None], rest], axis=0)

    if N * n_clusters <= (1 << 28):
        def step(centroids, _):
            # assign by min distance == max (p.c - |c|^2/2)
            scores = points @ centroids.T - 0.5 * jnp.sum(centroids ** 2, axis=1)[None, :]
            assign = jnp.argmax(scores, axis=1)
            onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32) * valid[:, None]
            counts = jnp.sum(onehot, axis=0)  # [C]
            sums = onehot.T @ points  # [C, D]
            new = sums / jnp.maximum(counts, 1.0)[:, None]
            # keep empty clusters where they were
            centroids = jnp.where((counts > 0)[:, None], new, centroids)
            return centroids, None

        centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
        scores = points @ centroids.T - 0.5 * jnp.sum(centroids ** 2, axis=1)[None, :]
        assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
        return centroids, assign

    # LARGE N x C (multi-million-row geographic clustering): the one-shot
    # [N, C] score/one-hot matrices are O(N*C) — 137 GB at 4M rows x 8k
    # clusters.  Row-chunked Lloyd: same assignments (argmax is pointwise),
    # centroid sums accumulate per chunk (fp reassociation only; this
    # branch only engages beyond the recorded small-bank operating points,
    # which keep the bit-stable one-shot path above).
    D_ = points.shape[1]
    CH = max(128, min(N, (1 << 27) // n_clusters) // 128 * 128)
    Np = (N + CH - 1) // CH * CH
    pts_c = jnp.pad(points, ((0, Np - N), (0, 0))).reshape(-1, CH, D_)
    val_c = jnp.pad(valid, (0, Np - N)).reshape(-1, CH)

    def step_big(centroids, _):
        cn = -0.5 * jnp.sum(centroids ** 2, axis=1)[None, :]

        def body(carry, xs):
            sums, counts = carry
            p, v = xs
            a = jnp.argmax(p @ centroids.T + cn, axis=1)
            oh = jax.nn.one_hot(a, n_clusters, dtype=jnp.float32) * v[:, None]
            return (sums + oh.T @ p, counts + jnp.sum(oh, axis=0)), None

        (sums, counts), _ = jax.lax.scan(
            body, (jnp.zeros((n_clusters, D_), jnp.float32),
                   jnp.zeros((n_clusters,), jnp.float32)), (pts_c, val_c))
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new, centroids), None

    centroids, _ = jax.lax.scan(step_big, centroids, None, length=iters)
    cn = -0.5 * jnp.sum(centroids ** 2, axis=1)[None, :]
    _, assign = jax.lax.scan(
        lambda c, p: (c, jnp.argmax(p @ centroids.T + cn, axis=1)
                      .astype(jnp.int32)), 0.0, pts_c)
    return centroids, assign.reshape(-1)[:N]
