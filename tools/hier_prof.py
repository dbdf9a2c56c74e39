import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Component-level timing of the hier pipeline pieces on the real TPU."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz, geo_sort_order
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval_hier import (build_hier_bank, retrieve_hier,
                                          _group_logits, select_tiles_grouped,
                                          _hier_parts_call, _family_tail)
from range_tpu.ops.retrieval_pallas import pack_queries, LOG2E, CLAMP2


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def t(fn, *a, iters=10):
    fence(fn(*a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


BANK_N = 100_000
B = 10_240
bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                     value_dtype=jnp.bfloat16)
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
print(f"T={hb.n_tiles} G_sem={hb.g_sem.shape[0]} G_geo={hb.g_geo.shape[0]}")

rng = np.random.default_rng(1)
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B),
                               np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1),
                     jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)

tw = t(jax.jit(lambda c: tower.apply(tp, c)), coords)
print(f"query tower 10k: {tw*1e3:.2f} ms")

srt = jax.jit(lambda x: geo_sort_order(x))
print(f"geo_sort_order: {t(srt, q_xyz)*1e3:.2f} ms")

gl = jax.jit(lambda qq: jnp.exp2(jnp.minimum(12.0 * LOG2E * _group_logits(qq, hb.g_sem), CLAMP2)))
e_s = gl(q)
print(f"sem group logits+exp [B,{hb.g_sem.shape[0]}]: {t(gl, q)*1e3:.2f} ms")

glg = jax.jit(lambda qq: jnp.exp2(jnp.minimum(40.0 * LOG2E * _group_logits(qq, hb.g_geo), CLAMP2)))
e_g = glg(q_xyz)
print(f"geo group logits+exp: {t(glg, q_xyz)*1e3:.2f} ms")

sel_f = jax.jit(functools.partial(select_tiles_grouped, hb=hb, k_tiles=16,
                                  bm=256, n_valid=B, j_sem=3, j_geo=2))
idx, sel = sel_f(e_s, e_g)
print(f"select_tiles_grouped: {t(sel_f, e_s, e_g)*1e3:.2f} ms")

qc = pack_queries(q, q_xyz, 12.0, 40.0, tier=hb.tier)
pk = functools.partial(_hier_parts_call, sem_d=hb.sem_d, bm=256, bn=hb.bn)
print(f"parts kernel K=16 bn=512: {t(pk, qc, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg, idx)*1e3:.2f} ms")

tail_s = jax.jit(functools.partial(_family_tail, bm=256, gpt=hb.bn // hb.gsz_sem))
print(f"sem tail: {t(tail_s, e_s, hb.g_sem_vmean, hb.g_sem_count, sel)*1e3:.2f} ms")
tail_g = jax.jit(functools.partial(_family_tail, bm=256, gpt=hb.bn // hb.gsz_geo))
print(f"geo tail: {t(tail_g, e_g, hb.g_geo_vmean, hb.g_geo_count, sel)*1e3:.2f} ms")

full = functools.partial(retrieve_hier, k_tiles=16, bm=256, j_sem=3, j_geo=2)
print(f"full retrieve_hier: {t(full, q, q_xyz, hb)*1e3:.2f} ms")
