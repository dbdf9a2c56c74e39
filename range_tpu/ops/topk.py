"""Top-k retrieval + recall harness.

The fidelity measure from BASELINE.md: recall@k of a (possibly approximate /
reduced-precision) retrieval against exact nearest neighbors over the bank's
semantic keys.  `exact_nn` (ops/retrieval.py) is the f32-exact ground truth;
`topk_sem` gives the candidate ranking for any logit precision tier.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..bank.bank import GeoBank
from ..ops.retrieval import _NEG, _pick_chunk, _chunked


@functools.partial(jax.jit, static_argnames=("k", "chunk", "precision"))
def topk_sem(q_sem: jnp.ndarray, bank: GeoBank, k: int = 10, chunk: int = 8192,
             precision=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k bank rows by semantic cosine similarity, streaming over chunks
    (running top-k merge, no [B, N] materialization).

    Returns (values [B, k], indices [B, k])."""
    n_rows = bank.num_rows
    chunk = _pick_chunk(n_rows, chunk)
    mask_neg = _NEG * (1.0 - bank.row_mask())
    ks = _chunked(bank.keys_sem.astype(jnp.float32), chunk)
    ms = _chunked(mask_neg, chunk)
    q = q_sem.astype(jnp.float32)
    B = q.shape[0]

    def body(carry, blk):
        best_v, best_i, offset = carry
        kk, mneg = blk
        sims = jnp.dot(q, kk.T, preferred_element_type=jnp.float32,
                       precision=precision) + mneg[None, :]
        v, i = jax.lax.top_k(sims, k)
        i = i.astype(jnp.int32) + offset
        merged_v = jnp.concatenate([best_v, v], axis=1)
        merged_i = jnp.concatenate([best_i, i], axis=1)
        v2, sel = jax.lax.top_k(merged_v, k)
        i2 = jnp.take_along_axis(merged_i, sel, axis=1)
        return (v2, i2, offset + kk.shape[0]), None

    init = (
        jnp.full((B, k), _NEG, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (best_v, best_i, _), _ = jax.lax.scan(body, init, (ks, ms))
    return best_v, best_i


@functools.partial(jax.jit, static_argnames=("k", "chunk", "tier"))
def topk_packed(q_sem: jnp.ndarray, bank: GeoBank, k: int = 10,
                chunk: int = 8192, tier: str = "fast"
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k bank rows by the SERVING-TIER semantic logits.

    Builds the same packed operands the fused Pallas kernel consumes
    (`pack_queries`/`pack_bank`, ops/retrieval_pallas.py) and ranks with the
    same default-precision matmul the kernel runs — so recall@k of this
    ranking against `exact_nn` (HIGHEST-precision f32) measures the retrieval
    fidelity of the tier actually served, not of a reference path.  The
    temperature/log2e factors folded into the packed queries are positive
    scalars and preserve the ranking.

    Returns (packed-logit values [B, k], indices [B, k])."""
    from .retrieval_pallas import pack_bank, pack_queries, packed_dims

    q_cat = pack_queries(q_sem, None, 12.0, 40.0, tier=tier)
    k_cat = pack_bank(bank.keys_sem, bank.xyz, tier=tier)
    sem_d, _ = packed_dims(bank.keys_sem.shape[1], tier)
    q_p = q_cat[:, :sem_d]
    k_p = k_cat[:, :sem_d]

    n_rows = bank.num_rows
    chunk = _pick_chunk(n_rows, chunk)
    mask_neg = _NEG * (1.0 - bank.row_mask())
    ks = _chunked(k_p, chunk)
    ms = _chunked(mask_neg, chunk)
    B = q_p.shape[0]

    def body(carry, blk):
        best_v, best_i, offset = carry
        kk, mneg = blk
        sims = jnp.dot(q_p, kk.T, preferred_element_type=jnp.float32
                       ) + mneg[None, :]
        v, i = jax.lax.top_k(sims, k)
        i = i.astype(jnp.int32) + offset
        merged_v = jnp.concatenate([best_v, v], axis=1)
        merged_i = jnp.concatenate([best_i, i], axis=1)
        v2, sel = jax.lax.top_k(merged_v, k)
        i2 = jnp.take_along_axis(merged_i, sel, axis=1)
        return (v2, i2, offset + kk.shape[0]), None

    init = (
        jnp.full((B, k), _NEG, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (best_v, best_i, _), _ = jax.lax.scan(body, init, (ks, ms))
    return best_v, best_i


def recall_at_k(candidate_idx: jnp.ndarray, true_idx: jnp.ndarray) -> float:
    """Fraction of queries whose true NN appears in their candidate list.
    candidate_idx [B, k], true_idx [B]."""
    hit = jnp.any(candidate_idx == true_idx[:, None], axis=1)
    return float(jnp.mean(hit.astype(jnp.float32)))
