"""One consolidated TPU job: int8 kernel smokes + recall decomposition."""
import time

from _tpu_common import standard_fixture, jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


# --- int8 parts/pruned kernels compile + match on real TPU ---
from range_tpu.bank.bank import GeoBank, quantize_values
from range_tpu.ops.retrieval_pallas import (pack_bank, pack_queries,
                                            packed_dims, retrieve_fused_parts,
                                            retrieve_pruned, NEG)

bank = GeoBank.synthetic(3, 3000, key_dim=256, value_dim=128, pad_to=2048)
qb = quantize_values(bank)
rng = np.random.default_rng(5)
q64 = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
q64 = q64 / jnp.linalg.norm(q64, axis=1, keepdims=True)
xyz64 = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
xyz64 = xyz64 / jnp.linalg.norm(xyz64, axis=1, keepdims=True)
q_cat = pack_queries(q64, xyz64, 12.0, 40.0, tier="fast")
sem_d, _ = packed_dims(256, "fast")
mask = (NEG * (1.0 - bank.row_mask()))[None, :].astype(jnp.float32)
k_cat = pack_bank(bank.keys_sem, bank.xyz, tier="fast")
Dv = 128


def norm(p):
    p = np.asarray(p)
    sem = p[:, :Dv] / np.maximum(p[:, 2 * Dv:2 * Dv + 1], 1e-30)
    geo = p[:, Dv:2 * Dv] / np.maximum(p[:, 2 * Dv + 1:2 * Dv + 2], 1e-30)
    return 0.5 * sem + 0.5 * geo


a = norm(retrieve_fused_parts(q_cat, k_cat, bank.values.astype(jnp.bfloat16),
                              mask, sem_d=sem_d, bm=64, bn=512))
lap("bf16 parts done")
b = norm(retrieve_fused_parts(q_cat, k_cat, qb.values, mask, qb.value_scale,
                              sem_d=sem_d, bm=64, bn=512))
rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-1)
print("parts i8 vs bf16 (normalized) maxrel:", rel.max(), flush=True)
assert rel.max() < 0.05
lap("int8 parts kernel OK on TPU")

from range_tpu.bank.clustered import cluster_bank

cb, stats = cluster_bank(qb, n_clusters=8, bn=512, seed=1)
fb, _ = cluster_bank(bank, n_clusters=8, bn=512, seed=1)
out_i8 = np.asarray(retrieve_pruned(q64, xyz64, cb, stats, bm=64, bn=512))
out_f = np.asarray(retrieve_pruned(q64, xyz64, fb, stats, bm=64, bn=512))
rel = np.abs(out_i8 - out_f) / np.maximum(np.abs(out_f), 1e-1)
print("pruned i8 vs bf16 maxrel:", rel.max(), flush=True)
assert rel.max() < 0.05
lap("int8 pruned kernel OK on TPU")

# --- recall decomposition (diag_recall) ---
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          select_tiles, _pad_queries,
                                          _hybrid_order)

B = 10_240
BM, TC, K = 256, 8, 16
bank, q, q_xyz = standard_fixture(b=B)
lap("fixture")
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hier bank")
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo

true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
t_true = true // hb.bn
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
print(f"tier ceiling (fast, all rows): {(best == true).mean():.4f}",
      flush=True)
lap("ALL DONE")
