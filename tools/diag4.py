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
B = 10240
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B), np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = tower.apply(tp, coords)
q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
q_xyz = lonlat_deg_to_xyz(coords)

true_tile = np.asarray(exact_nn(q, hb.bank, chunk=4096)) // hb.bn
mask_neg = np.asarray(hb.bank.row_mask()) > 0
bx = hb.bank.xyz.astype(jnp.float32)
gt = []
for lo in range(0, B, 2048):
    gl = q_xyz[lo:lo+2048].astype(jnp.float32) @ bx.T
    gl = jnp.where(jnp.asarray(mask_neg)[None, :], gl, -jnp.inf)
    gt.append(np.asarray(jnp.argmax(gl, axis=1)))
geo_true_tile = np.concatenate(gt) // hb.bn

bm = 256
q_s, q_x = _pad_queries(q, q_xyz, hb, bm)
q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
m_s, s_s, m_g, s_g = _hier_scan_call(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                     bm=bm, tc=8, gpt_s=gpt_s, gpt_g=gpt_g)
m_s = np.asarray(m_s)[:B]; s_s = np.asarray(s_s)[:B]
m_g = np.asarray(m_g)[:B]; s_g = np.asarray(s_g)[:B]

def sel_hit(m, s, order, tt, K, j):
    pos = np.empty(B, np.int64); pos[order] = np.arange(B)
    _, sel = select_tiles(jnp.asarray(m[order]), jnp.asarray(s[order]),
                          jnp.asarray(m[order]), jnp.asarray(s[order]),
                          t_real=hb.t_real, k_tiles=K, bm=bm, n_valid=B,
                          j_sem=j, j_geo=0, mode="range")
    sel_q = np.asarray(sel)[pos // bm]
    return (sel_q[np.arange(B), tt] > 0).mean()

home_s = np.argmax(m_s, axis=1)
order_s = np.argsort(home_s, kind="stable")
for (K, j) in ((12, 2), (16, 2), (16, 4), (24, 4), (32, 6)):
    print(f"SEM home-sort K={K} j={j}: hit {sel_hit(m_s, s_s, order_s, true_tile, K, j):.4f}", flush=True)
order_g = np.asarray(geo_sort_order(q_xyz))
for (K, j) in ((8, 2), (12, 4), (16, 4), (16, 8)):
    print(f"GEO geo-sort K={K} j={j}: hit {sel_hit(m_g, s_g, order_g, geo_true_tile, K, j):.4f}", flush=True)
home_g = np.argmax(m_g, axis=1)
order_g2 = np.argsort(home_g, kind="stable")
for (K, j) in ((8, 2), (12, 4), (16, 4)):
    print(f"GEO home-sort K={K} j={j}: hit {sel_hit(m_g, s_g, order_g2, geo_true_tile, K, j):.4f}", flush=True)
