"""Decompose the hier recall@1 miss: scan-signal coverage vs logit tier.

For each query: t_true = tile of the f32-exact argmax row.  Measures
  cov@j   — t_true in the query's OWN top-j tiles by scan max-group-logit
  sel@K   — t_true in the query TILE's selected K tiles (shared union)
  tier    — argmax by fast-tier packed logits == exact argmax (all rows)
"""
import time

from _tpu_common import standard_fixture, jax, jnp, np

from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          select_tiles, _pad_queries,
                                          _hybrid_order)
from range_tpu.ops.retrieval_pallas import pack_queries

B = 10_240
BM, TC, K = 256, 8, 16

t0 = time.time()


def lap(msg):
    print(f"[{time.time()-t0:6.1f}s] {msg}", flush=True)


bank, q, q_xyz = standard_fixture(b=B)
lap("fixture")
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hier bank")
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo

true = np.asarray(exact_nn(q, hb.bank, chunk=4096))  # rows in hb.bank order
t_true = true // hb.bn  # [B]
lap("exact NN")

q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
order = np.asarray(_hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32),
                                 B, hb.t_pad, sort="geo"))
q_cat_s = q_cat[order]
t_true_s = np.where(order < B, t_true[np.minimum(order, B - 1)], -1)

m_s, s_s, m_g, s_g, _ = _hier_scan_call(
    q_cat_s, hb.g_sem_cat, hb.g_geo_cat, hb.g_sem_vw, hb.g_geo_vw,
    bm=BM, tc=TC, gpt_s=gpt_s, gpt_g=gpt_g)
m_s_np = np.asarray(m_s)
lap("scan")
valid = t_true_s >= 0

rank = (m_s_np > m_s_np[np.arange(len(t_true_s)),
                        np.maximum(t_true_s, 0)][:, None]).sum(1)
for j in (1, 2, 4, 8, 16):
    print(f"cov@{j} (t_true in own top-{j} scan tiles): "
          f"{(rank[valid] < j).mean():.4f}", flush=True)

for jsem, k in ((2, 16), (3, 16), (4, 16), (2, 24), (4, 24)):
    idx, sel = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real, k_tiles=k,
                            bm=BM, n_valid=B, j_sem=jsem, j_geo=2)
    sel_np = np.asarray(sel)
    qt = np.arange(len(t_true_s)) // BM
    hit = sel_np[qt, np.maximum(t_true_s, 0)] > 0
    print(f"sel@K={k},j_sem={jsem}: {hit[valid].mean():.4f}", flush=True)
lap("selection")


@jax.jit
def am(qc):
    logits = jnp.dot(qc, hb.k_cat[:, :hb.sem_d].T,
                     preferred_element_type=jnp.float32)
    logits = jnp.where(hb.mask_neg[0][None, :] >= 0, logits, -jnp.inf)
    return jnp.argmax(logits, axis=1).astype(jnp.int32)


best = np.concatenate([np.asarray(am(q_cat[i:i + 2048, :hb.sem_d]))
                       for i in range(0, B, 2048)])
print(f"tier ceiling (fast, all rows): {(best == true).mean():.4f}")
lap("done")
