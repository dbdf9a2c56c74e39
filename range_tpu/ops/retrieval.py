"""Retrieval core: dual-softmax bank attention (exact, streaming).

This is the hot path of RANGE/RANGE+ (`range/range.py:209-240`):

  sem  = softmax(sem_temp * q_sem @ K_semT) @ V          # semantic path
  geo  = softmax(geo_temp * q_xyz @ K_xyzT) @ V          # angular path (RANGE+)
  out  = beta * sem + (1 - beta) * geo                   # range.py:238

The reference materializes the full [B, N] similarity matrices on one GPU.
Here both softmax-weighted sums are computed **streaming** over bank row
chunks with an online (flash-attention style) softmax: O(B * Dv) memory
independent of bank size, exact to f32 rounding.  The same update rule is
used by the Pallas kernel (`retrieval_pallas.py`) and, across devices, by the
sharded combine (`parallel/sharded.py`) — per-shard partials merge exactly
via the max/logsumexp algebra below.

All matmuls take ``preferred_element_type=f32`` so bf16 keys/values still
accumulate in f32 on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..bank.bank import GeoBank

_NEG = -1e30


class SoftmaxState(NamedTuple):
    """Online-softmax accumulator for one attention path."""

    m: jnp.ndarray  # [B]   running max of logits
    d: jnp.ndarray  # [B]   running sum of exp(logit - m)
    acc: jnp.ndarray  # [B, Dv] running sum of exp(logit - m) * V


def init_state(batch: int, value_dim: int, dtype=jnp.float32) -> SoftmaxState:
    return SoftmaxState(
        m=jnp.full((batch,), _NEG, dtype),
        d=jnp.zeros((batch,), dtype),
        acc=jnp.zeros((batch, value_dim), dtype),
    )


def update_state(state: SoftmaxState, logits: jnp.ndarray, values: jnp.ndarray
                 ) -> SoftmaxState:
    """Fold one [B, C] logit block with its [C, Dv] values into the state."""
    m_new = jnp.maximum(state.m, jnp.max(logits, axis=-1))
    scale = jnp.exp(state.m - m_new)
    p = jnp.exp(logits - m_new[:, None])
    d_new = state.d * scale + jnp.sum(p, axis=-1)
    acc_new = state.acc * scale[:, None] + jnp.dot(
        p.astype(values.dtype), values, preferred_element_type=state.acc.dtype
    )
    return SoftmaxState(m_new, d_new, acc_new)


def merge_states(a: SoftmaxState, b: SoftmaxState) -> SoftmaxState:
    """Exact associative merge of two partial softmaxes (used by the sharded
    path to combine per-device partials)."""
    m = jnp.maximum(a.m, b.m)
    sa = jnp.exp(a.m - m)
    sb = jnp.exp(b.m - m)
    return SoftmaxState(
        m=m,
        d=a.d * sa + b.d * sb,
        acc=a.acc * sa[:, None] + b.acc * sb[:, None],
    )


def finalize(state: SoftmaxState) -> jnp.ndarray:
    return state.acc / state.d[:, None]


def _chunked(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    n = x.shape[0]
    assert n % chunk == 0, (n, chunk)
    return x.reshape(n // chunk, chunk, *x.shape[1:])


def _pick_chunk(n_rows: int, chunk: int) -> int:
    """Largest divisor of n_rows that is <= chunk (static, trace-time)."""
    chunk = min(chunk, n_rows)
    for c in range(chunk, 0, -1):
        if n_rows % c == 0:
            return c
    return n_rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "sem_temp", "geo_temp", "beta", "chunk", "mode", "compute_dtype", "precision",
    ),
)
def retrieve(
    q_sem: jnp.ndarray,
    q_xyz: Optional[jnp.ndarray],
    bank: GeoBank,
    *,
    sem_temp: float = 12.0,  # RANGE+ default (range.py:108); RANGE uses 15
    geo_temp: float = 40.0,
    beta: float = 0.5,
    mode: str = "range+",
    chunk: int = 4096,
    compute_dtype=jnp.float32,
    precision: Optional[jax.lax.Precision] = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Streaming exact dual-softmax retrieval.

    Args:
      q_sem: [B, Dk] L2-normalized query embeddings (SatCLIP location tower).
      q_xyz: [B, 3] query unit vectors (required for mode='range+').
      bank: GeoBank (row-padded; invalid rows are masked).
      mode: 'range' (semantic only, temp=sem_temp — range.py:102-105) or
            'range+' (blend, temps 12/40 — range.py:107-112).
      precision: matmul precision for the similarity GEMMs.  Defaults to
        HIGHEST: on TPU the backend default routes f32 operands through a
        single bf16 MXU pass, and the geo temperature (40) amplifies that
        into ~25% weight errors.  This streaming path is the correctness
        reference; the fast path is the Pallas kernel (retrieval_pallas.py).
    Returns:
      [B, Dv] retrieved high-res features (f32).
    """
    if getattr(bank, "value_scale", None) is not None:
        # int8-quantized bank (bank.quantize_values): the exact path works on
        # the f32 reconstruction (the Pallas kernel streams int8 directly)
        import dataclasses as _dc

        from ..bank.bank import dequantize_values

        bank = _dc.replace(bank, values=dequantize_values(bank),
                           value_scale=None)
    sem_state, geo_state = partial_states(
        q_sem, q_xyz, bank,
        sem_temp=sem_temp, geo_temp=geo_temp, mode=mode, chunk=chunk,
        compute_dtype=compute_dtype, precision=precision,
    )
    sem = finalize(sem_state)
    if mode != "range+":
        return sem
    geo = finalize(geo_state)
    return beta * sem + (1.0 - beta) * geo


def partial_states(
    q_sem: jnp.ndarray,
    q_xyz: Optional[jnp.ndarray],
    bank: GeoBank,
    *,
    sem_temp: float,
    geo_temp: float = 40.0,
    mode: str = "range+",
    chunk: int = 4096,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[SoftmaxState, SoftmaxState]:
    """Streaming pass over the (local) bank returning un-finalized softmax
    states for the semantic and geo paths.  Used directly by `retrieve` and,
    per shard, by `parallel/sharded.py` whose psum/pmax combine relies on the
    merge algebra of `merge_states`."""
    B = q_sem.shape[0]
    Dv = bank.value_dim
    n_rows = bank.num_rows
    chunk = _pick_chunk(n_rows, chunk)

    mask_neg = (_NEG * (1.0 - bank.row_mask())).astype(compute_dtype)  # 0 valid, -inf pad
    ks = _chunked(bank.keys_sem.astype(compute_dtype), chunk)
    vs = _chunked(bank.values.astype(compute_dtype), chunk)
    ms = _chunked(mask_neg, chunk)
    q_sem = q_sem.astype(compute_dtype)

    want_geo = mode == "range+"
    if want_geo:
        if q_xyz is None:
            raise ValueError("mode='range+' requires q_xyz")
        kx = _chunked(bank.xyz.astype(compute_dtype), chunk)
        q_xyz = q_xyz.astype(compute_dtype)
    else:
        kx = ks  # unused placeholder with matching leading dims

    def body(carry, blk):
        sem_state, geo_state = carry
        k_sem, k_xyz, v, mneg = blk
        logits_s = (
            sem_temp
            * jnp.dot(q_sem, k_sem.T, preferred_element_type=jnp.float32,
                      precision=precision)
            + mneg[None, :]
        )
        sem_state = update_state(sem_state, logits_s, v)
        if want_geo:
            logits_g = (
                geo_temp
                * jnp.dot(q_xyz, k_xyz.T, preferred_element_type=jnp.float32,
                          precision=precision)
                + mneg[None, :]
            )
            geo_state = update_state(geo_state, logits_g, v)
        return (sem_state, geo_state), None

    init = (init_state(B, Dv), init_state(B, Dv))
    (sem_state, geo_state), _ = jax.lax.scan(body, init, (ks, kx, vs, ms))
    return sem_state, geo_state


@functools.partial(jax.jit, static_argnames=("chunk", "precision"))
def exact_nn(q_sem: jnp.ndarray, bank: GeoBank, chunk: int = 8192,
             precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Exact argmax over semantic similarity — ground truth for recall@k.

    Streaming over bank chunks (no [B, N] materialization).  The similarity
    matmul defaults to HIGHEST precision: the TPU default routes f32 operands
    through one bf16 pass, which is exactly the serving-tier rounding this
    ground truth must NOT share (a same-precision comparison makes recall@1
    vacuously 1.0).
    Returns [B] int32 bank row indices.
    """
    n_rows = bank.num_rows
    chunk = _pick_chunk(n_rows, chunk)
    mask_neg = _NEG * (1.0 - bank.row_mask())
    ks = _chunked(bank.keys_sem.astype(jnp.float32), chunk)
    ms = _chunked(mask_neg, chunk)
    q = q_sem.astype(jnp.float32)

    def body(carry, blk):
        best, best_idx, offset = carry
        k, mneg = blk
        sims = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                       precision=precision) + mneg[None, :]
        blk_best = jnp.max(sims, axis=-1)
        blk_idx = jnp.argmax(sims, axis=-1).astype(jnp.int32) + offset
        take = blk_best > best
        return (
            jnp.where(take, blk_best, best),
            jnp.where(take, blk_idx, best_idx),
            offset + k.shape[0],
        ), None

    init = (
        jnp.full((q.shape[0],), _NEG, jnp.float32),
        jnp.zeros((q.shape[0],), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (best, best_idx, _), _ = jax.lax.scan(body, init, (ks, ms))
    return best_idx
