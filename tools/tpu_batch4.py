"""Isolate the hier_nn recall collapse: B dependence vs code regression."""
import time

from _tpu_common import standard_fixture, jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, hier_nn,
                                          _hier_scan_call, select_tiles,
                                          _pad_queries, _hybrid_order)
from range_tpu.ops.retrieval_pallas import pack_queries

B = 10_240
bank, q, q_xyz = standard_fixture(b=B)
lap("fixture")
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hb")
true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
lap("exact NN")

for BB in (10_240, 2048):
    nn = np.asarray(hier_nn(q[:BB], q_xyz[:BB], hb, k_tiles=16))
    rec = (nn == true[:BB]).mean()
    print(f"hier_nn B={BB}: recall {rec:.4f}", flush=True)

# selection coverage at B=2048 for comparison
BB = 2048
q_s, q_x = _pad_queries(q[:BB], q_xyz[:BB], hb, 256)
q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
order = np.asarray(_hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32),
                                 BB, hb.t_pad, sort="geo"))
q_cat_s = q_cat[order]
t_true_s = np.where(order < BB, (true[:BB] // hb.bn)[np.minimum(order, BB - 1)], -1)
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
m_s, s_s, m_g, s_g, _ = _hier_scan_call(
    q_cat_s, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw, hb.g_geo_vw,
    bm=256, tc=8, gpt_s=gpt_s, gpt_g=gpt_g)
idx, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real, k_tiles=16,
                        bm=256, n_valid=BB, j_sem=2, j_geo=2)
sel_np = np.asarray(sel)
qt = np.arange(len(t_true_s)) // 256
hit = sel_np[qt, np.maximum(t_true_s, 0)] > 0
valid = t_true_s >= 0
print(f"sel@K=16 (B=2048): {hit[valid].mean():.4f}", flush=True)
lap("DONE")
