"""Embedding extraction: encoder + task -> npz dumps.

Counterpart of `range/utils/save.py:7-58`: per split, run the encoder over
batches and save ``{task}_{split}.npz`` with keys {coords, embeddings, y}
(the exact schema `evaluate_npz` reads back, `utils/evaluate.py:20-26`).
Batching is jit-friendly: the tail batch is padded to the batch size so the
whole sweep reuses ONE compiled program (the reference re-traces nothing but
pays python+transfer per batch; here everything but the final host fetch
stays on device)."""

from __future__ import annotations

import os
import numpy as np

from ..data.tasks import GeoTask


def encode_task(encoder, task: GeoTask, batch_size: int = 5000) -> np.ndarray:
    """[N, D] embeddings for a task's coords with one compiled batch shape."""
    import jax.numpy as jnp

    coords = np.asarray(task.coords, np.float32)
    n = coords.shape[0]
    batch_size = min(batch_size, n)
    out = np.empty((n, encoder.embedding_dim), np.float32)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        chunk = coords[start:stop]
        if chunk.shape[0] < batch_size:  # pad tail to the compiled shape
            chunk = np.pad(chunk, ((0, batch_size - chunk.shape[0]), (0, 0)))
        emb = np.asarray(encoder(jnp.asarray(chunk)))
        out[start:stop] = emb[: stop - start]
    return out


def save_embeddings(encoder, train: GeoTask, val: GeoTask, embeddings_dir: str,
                    model_name: str, task_name: str, batch_size: int = 5000):
    """Writes {task}_train.npz / {task}_val.npz under
    embeddings_dir/model_name (save.py:8-15 directory scheme)."""
    out_dir = os.path.join(embeddings_dir, model_name)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for split, task in [("train", train), ("val", val)]:
        emb = encode_task(encoder, task, batch_size)
        path = os.path.join(out_dir, f"{task_name}_{split}.npz")
        np.savez(path, coords=task.coords, embeddings=emb, y=task.labels)
        paths[split] = path
    return paths
