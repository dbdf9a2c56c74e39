import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-3 experiment battery #1 (real TPU, one process):

A. stage breakdown of the current hier pipeline (scan / sort / select /
   parts) at the serving config — what to attack first;
B. micro-benchmarks for the candidate-row top-k design:
   per-query row gather bandwidth, approx_max_k cost, int8 MXU rate;
C. coverage statistics for candidate-row selection: P(true argmax row is in
   the top-j tiles' top-g fine groups per query) — the recall feasibility
   of a scheme that replaces the K-tile argmax kernel with per-query
   candidate rows.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          _hier_scan_stats_call, _pad_queries,
                                          _hybrid_order, hier_topk)
from range_tpu.ops.retrieval_pallas import pack_queries

BANK_N = 100_000
B = 10_240
BM, TC = 256, 16


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, 'dtype')][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, iters=10, **kw):
    f = functools.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast",
                         seed=0)
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    N = hb.k_cat.shape[0]
    G = N // hb.gsz_sem
    print(f"t_real={hb.t_real} t_pad={hb.t_pad} N={N} G={G}", flush=True)

    # ---- B1: per-query row gather from khl [N, 512] bf16 ----
    khl = hb.khl_sem
    for ncand in (64, 128, 256):
        idx = jnp.asarray(rng.integers(0, BANK_N, (B, ncand)), jnp.int32)

        @jax.jit
        def gather_score(idx, qv):
            rows = khl[idx]                       # [B, ncand, 512]
            qh2 = jnp.concatenate([qv, qv], 1).astype(jnp.bfloat16)
            s = jnp.einsum("bcd,bd->bc", rows, qh2,
                           preferred_element_type=jnp.float32)
            return jnp.max(s, axis=1), jnp.argmax(s, axis=1)

        ms = t(gather_score, idx, q)
        print(f"gather+score ncand={ncand}: {ms:.2f} ms "
              f"({B*ncand*1024/ms*1e3/1e9:.0f} GB/s)", flush=True)

    # int8 variant of the gather (quarter the bytes)
    k_i8 = jnp.clip(jnp.round(bank.keys_sem[: N] * 127), -127, 127
                    ).astype(jnp.int8)
    for ncand in (128, 256):
        idx = jnp.asarray(rng.integers(0, BANK_N, (B, ncand)), jnp.int32)

        @jax.jit
        def gather_score_i8(idx, qv):
            rows = k_i8[idx].astype(jnp.bfloat16)   # [B, ncand, 256]
            s = jnp.einsum("bcd,bd->bc", rows, qv.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return jnp.max(s, axis=1)

        ms = t(gather_score_i8, idx, q)
        print(f"gather+score int8 ncand={ncand}: {ms:.2f} ms", flush=True)

    # ---- B2: approx_max_k over [B, G] ----
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, G), jnp.float32)
    for k in (16, 32):
        ms = t(jax.jit(lambda x: jax.lax.approx_max_k(x, k)), logits)
        print(f"approx_max_k k={k} over [B,{G}] f32: {ms:.2f} ms", flush=True)
    lb = logits.astype(jnp.bfloat16)
    ms = t(jax.jit(lambda x: jax.lax.approx_max_k(x.astype(jnp.float32), 16)), lb)
    print(f"approx_max_k k=16 over bf16->f32: {ms:.2f} ms", flush=True)
    # materialization cost of [B, G] bf16 from the scan would be extra.

    # ---- B3: int8 vs bf16 MXU rate (plain XLA matmul) ----
    a8 = jnp.asarray(rng.integers(-127, 127, (8192, 512)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (512, 8192)), jnp.int8)
    ms = t(jax.jit(lambda a, b: jax.lax.dot(a, b,
           preferred_element_type=jnp.int32)), a8, b8)
    fl = 2 * 8192 * 512 * 8192
    print(f"int8 matmul 8192x512x8192: {ms:.3f} ms ({fl/ms*1e3/1e12:.0f} TOP/s)",
          flush=True)
    ab = a8.astype(jnp.bfloat16); bb = b8.astype(jnp.bfloat16)
    ms = t(jax.jit(lambda a, b: jax.lax.dot(a, b,
           preferred_element_type=jnp.float32)), ab, bb)
    print(f"bf16 matmul same shape: {ms:.3f} ms ({fl/ms*1e3/1e12:.0f} TFLOP/s)",
          flush=True)

    # ---- C: candidate-row coverage stats ----
    # true argmax rows (HIGHEST-precision exact NN on the hier bank order)
    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
    true_tile = true // hb.bn
    true_group = true // hb.gsz_sem

    # fine group logits per query, chunked (serving-tier packed queries)
    q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
    q_cat = pack_queries(q_s, None, 12.0, 40.0, tier=hb.tier)
    sem_d = hb.sem_d

    @jax.jit
    def group_logits(qc):
        return jnp.dot(qc[:, :sem_d], hb.g_sem_cat[:, :sem_d].T,
                       preferred_element_type=jnp.float32)  # [b, G_pad]

    Gpad = hb.g_sem_cat.shape[0]
    gpt = hb.bn // hb.gsz_sem
    hits_any = {}
    for lo in range(0, B, 2048):
        gl = group_logits(q_cat[lo:lo + 2048])      # [2048, Gpad]
        gl = gl[:, : hb.t_real * gpt]
        # per-tile max + per-tile top-2 groups
        glt = gl.reshape(-1, hb.t_real, gpt)
        tile_max = jnp.max(glt, axis=2)             # [b, T]
        g_arg1 = jnp.argmax(glt, axis=2)            # [b, T]
        glt2 = jnp.where(jax.nn.one_hot(g_arg1, gpt, dtype=bool), -jnp.inf, glt)
        g_arg2 = jnp.argmax(glt2, axis=2)
        tt = true_tile[lo:lo + 2048]
        tg = true_group[lo:lo + 2048]
        for j in (4, 8, 16, 32):
            _, top_t = jax.lax.top_k(tile_max, j)   # [b, j]
            top_t = np.asarray(top_t)
            a1 = np.asarray(g_arg1); a2 = np.asarray(g_arg2)
            bidx = np.arange(top_t.shape[0])[:, None]
            cand1 = top_t * gpt + a1[bidx, top_t]   # top-1 group of each tile
            cand2 = top_t * gpt + a2[bidx, top_t]
            got1 = (cand1 == tg[:, None]).any(1)
            got12 = got1 | (cand2 == tg[:, None]).any(1)
            hits_any.setdefault((j, 1), []).append(got1)
            hits_any.setdefault((j, 2), []).append(got12)
        # global top-m groups per query
        for m in (8, 16, 32, 64):
            _, top_g = jax.lax.top_k(gl, m)
            got = (np.asarray(top_g) == tg[:, None]).any(1)
            hits_any.setdefault(("glob", m), []).append(got)
    for key in sorted(hits_any, key=str):
        v = np.concatenate(hits_any[key])
        print(f"coverage {key}: {v.mean():.5f}", flush=True)

    # current hier_topk for reference
    ms = t(hier_topk, q, q_xyz, hb)
    got = np.asarray(hier_topk(q, q_xyz, hb))
    print(f"hier_topk(K=56): {ms:.2f} ms recall {float((got==true).mean()):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
