"""Validate scan stats kernels vs XLA reference at B=2048 and B=10240."""
import time

from _tpu_common import standard_fixture, jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


from range_tpu.ops.retrieval_hier import (build_hier_bank, _hier_scan_call,
                                          _hier_scan_stats_call, _pad_queries)
from range_tpu.ops.retrieval_pallas import pack_queries

B = 10_240
bank, q, q_xyz = standard_fixture(b=B)
lap("fixture")
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hb")
gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo


@jax.jit
def ref_stats(q_cat):
    # XLA reference: group logits -> per-tile max (sem family)
    l = jnp.dot(q_cat, hb.g_sem_cat.T,
                preferred_element_type=jnp.float32)  # [Bp, G_pad]
    Bp = q_cat.shape[0]
    return l.reshape(Bp, hb.t_pad, gpt_s).max(axis=2)


for BB in (2048, 10_240):
    q_s, q_x = _pad_queries(q[:BB], q_xyz[:BB], hb, 256)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    m_ref = np.asarray(ref_stats(q_cat))
    m1 = np.asarray(_hier_scan_call(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                    hb.g_sem_vw, hb.g_geo_vw, bm=256, tc=8,
                                    gpt_s=gpt_s, gpt_g=gpt_g)[0])
    m2 = np.asarray(_hier_scan_stats_call(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                          bm=256, tc=8, gpt_s=gpt_s,
                                          gpt_g=gpt_g)[0])
    print(f"B={BB}: fused-scan maxerr {np.abs(m1 - m_ref).max():.5f}  "
          f"stats-scan maxerr {np.abs(m2 - m_ref).max():.5f}  "
          f"argmax-tile agree fused {(m1.argmax(1) == m_ref.argmax(1)).mean():.4f} "
          f"stats {(m2.argmax(1) == m_ref.argmax(1)).mean():.4f}", flush=True)
lap("DONE")
