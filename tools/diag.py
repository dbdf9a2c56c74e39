import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          select_tiles, _sort_order,
                                          _pad_queries)
from range_tpu.ops.retrieval_pallas import pack_queries

bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096, value_dtype=jnp.bfloat16)
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
rng = np.random.default_rng(1)
B = 2048
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B), np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)

true = np.asarray(exact_nn(q, hb.bank, chunk=8192))   # clustered-row ids
true_tile = true // hb.bn
print("true tiles: distinct", len(set(true_tile.tolist())), flush=True)

bm = 256
order = np.asarray(_sort_order(q, q_xyz, hb))
inv = np.argsort(order)
q_s, q_x = _pad_queries(q[order], q_xyz[order], hb, bm)
q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
m_s, s_s, m_g, s_g = _hier_scan_call(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                     bm=bm, tc=8, gpt_s=gpt_s, gpt_g=gpt_g)
m_s_u = np.asarray(m_s)[inv]  # unsorted per-query stats
tt = true_tile  # per (unsorted) query
# rank of the true tile by m_s per query
ranks = (m_s_u > m_s_u[np.arange(B), tt][:, None]).sum(axis=1)
for j in (1, 2, 4, 8, 16):
    print(f"argmax tile within top-{j} by m_s: {(ranks < j).mean():.4f}", flush=True)

# where in the K selection does it land?
for (K, js, jg) in ((16, 2, 2), (32, 4, 2), (64, 8, 2)):
    idx, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real, k_tiles=K,
                            bm=bm, n_valid=B, j_sem=js, j_geo=jg)
    sel_u = np.asarray(sel)[(np.arange(len(order)) // bm)][inv]
    hit = sel_u[np.arange(B), tt] > 0
    print(f"K={K} j_sem={js}: selected-tile hit {hit.mean():.4f}", flush=True)

# how much does bf16 'fast' tier hurt m_s vs f32?
q_cat32 = pack_queries(q_s, q_x, 12.0, 40.0, tier="exact")
gs32 = np.asarray(hb.g_sem_cat, np.float32)
# exact sem logit vs group centroids, f32 (via numpy on host, slow but small)
qs32 = np.asarray(q_cat32[:, :256], np.float32)[:B]
