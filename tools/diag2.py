import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz, geo_sort_order
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          select_tiles, _pad_queries)
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

true = np.asarray(exact_nn(q, hb.bank, chunk=8192))
true_tile = true // hb.bn
# geo argmax ground truth (for the geo family's coverage)
bx = hb.bank.xyz.astype(jnp.float32)
geo_logits = q_xyz.astype(jnp.float32) @ bx.T + jnp.asarray(np.where(np.asarray(hb.bank.row_mask())>0, 0, -1e30))[None,:]
geo_true_tile = np.asarray(jnp.argmax(geo_logits, axis=1)) // hb.bn

bm = 256
q_s, q_x = _pad_queries(q, q_xyz, hb, bm)
q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
m_s, s_s, m_g, s_g = _hier_scan_call(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                     bm=bm, tc=8, gpt_s=gpt_s, gpt_g=gpt_g)
m_s = np.asarray(m_s)[:B]; s_s = np.asarray(s_s)[:B]
m_g = np.asarray(m_g)[:B]; s_g = np.asarray(s_g)[:B]

def sel_hit(stats_m, stats_s, order, tt, K, j):
    iv = np.argsort(order)
    ms = jnp.asarray(stats_m[order]); ss = jnp.asarray(stats_s[order])
    idx, sel = select_tiles(ms, ss, ms, ss, t_real=hb.t_real, k_tiles=K,
                            bm=bm, n_valid=B, j_sem=j, j_geo=0, mode="range")
    sel_u = np.asarray(sel)[(np.arange(B) // bm)][iv[:B] // bm if False else (np.arange(B) // bm)]
    # map each original query to its sorted position's tile
    pos = np.empty(B, np.int64); pos[order] = np.arange(B)
    sel_q = np.asarray(sel)[pos // bm]  # [B, t_pad] selection for each original query
    return (sel_q[np.arange(B), tt] > 0).mean()

# sem family with home-tile sort
home_s = np.argmax(m_s, axis=1)
order_s = np.argsort(home_s, kind="stable")
for (K, j) in ((12, 2), (16, 2), (16, 4), (24, 4), (32, 4)):
    h = sel_hit(m_s, s_s, order_s, true_tile, K, j)
    print(f"SEM home-sort K={K} j={j}: hit {h:.4f}", flush=True)

# geo family with geo sort
order_g = np.asarray(geo_sort_order(q_xyz))
for (K, j) in ((8, 2), (12, 2), (16, 2)):
    h = sel_hit(m_g, s_g, order_g, geo_true_tile, K, j)
    print(f"GEO geo-sort K={K} j={j}: hit {h:.4f}", flush=True)
# geo family with home sort (would one sort suffice?)
home_g = np.argmax(m_g, axis=1)
order_g2 = np.argsort(home_g, kind="stable")
for (K, j) in ((8, 2), (12, 2)):
    h = sel_hit(m_g, s_g, order_g2, geo_true_tile, K, j)
    print(f"GEO home-sort K={K} j={j}: hit {h:.4f}", flush=True)
# cross-check: sem selection quality when geo-sorted (the current failure)
h = sel_hit(m_s, s_s, order_g, true_tile, 16, 2)
print(f"SEM geo-sort K=16 j=2: hit {h:.4f}", flush=True)
