"""Round-4 glue decomposition: where do the ~1.35 non-kernel ms go?

retrieve_hier measured 4.47 ms vs scan 1.4 + parts ~2.35 = 3.75 in-graph,
and e2e adds another 0.65 over tower+retrieval.  This times the pipeline
stages in one process (no full encoder — that mix crashes the worker):
  pack+sort | scan | select | parts | combine(unproject+normalize+blend+
  unsort) — each jitted standalone on the flagship bank.
"""
import functools

import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.retrieval_hier import (
        _hier_parts_family_call, _hier_scan_call, _hybrid_order,
        _pad_queries, prepare_hier_bank, retrieve_hier, select_tiles)
    from range_tpu.ops.retrieval_pallas import pack_queries

    print("device:", jax.devices()[0])
    bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    hb = prepare_hier_bank(bank, bn=512, gsz_sem=16, gsz_geo=64,
                           lr_rank=256, res_rank=128, topk_gsz=8, seed=0,
                           cache_path="/tmp/range_bench_hier_cache.npz")
    # queries from the standard tower fixture
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)
    rng = np.random.default_rng(1)
    B = 10_240
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = jnp.asarray(np.asarray(
        (q / jnp.linalg.norm(q, axis=1, keepdims=True)))).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)

    KT, JS, KG, BM, TC_, SB = 32, 3, 16, 256, 16, 512

    t_full = C.timeit(retrieve_hier, q, q_xyz, hb, iters=50,
                      k_tiles=KT, j_sem=JS, k_geo=KG, scan_bm=SB)
    print(f"retrieve_hier full:      {t_full:6.2f} ms")

    # --- stage 1: pack + sort ---
    @jax.jit
    def packsort(q, q_xyz):
        q_s, q_x = _pad_queries(q, q_xyz, hb, BM)
        q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
        order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32),
                              q.shape[0], hb.t_pad, sort="geo")
        inv = jnp.argsort(order)
        return q_cat[order], inv

    t_ps = C.timeit(packsort, q, q_xyz, iters=60)
    print(f"pack+sort:               {t_ps:6.2f} ms")
    q_cat, inv = packsort(q, q_xyz)
    q_cat = jnp.asarray(np.asarray(q_cat))

    # --- stage 2: fused scan ---
    gpt_s, gpt_g = hb.bn // hb.gsz_sem, hb.bn // hb.gsz_geo
    scan = functools.partial(_hier_scan_call, bm=SB, tc=TC_, gpt_s=gpt_s,
                             gpt_g=gpt_g, has_geo=True)
    t_scan = C.timeit(scan, q_cat, hb.g_sem_cat, hb.g_geo_cat,
                      hb.g_sem_vw_lr, hb.g_geo_vw, iters=60)
    print(f"fused scan (lr):         {t_scan:6.2f} ms")
    m_s, s_s, m_g, s_g, tails = scan(q_cat, hb.g_sem_cat, hb.g_geo_cat,
                                     hb.g_sem_vw_lr, hb.g_geo_vw)
    stats = [jnp.asarray(np.asarray(x)) for x in (m_s, s_s, m_g, s_g)]
    tails = jnp.asarray(np.asarray(tails))

    # --- stage 3: selection ---
    @jax.jit
    def select(m_s, s_s, m_g, s_g):
        idx_s, _ = select_tiles(m_s, s_s, m_g, s_g, t_real=hb.t_real,
                                k_tiles=KT, bm=BM, n_valid=B, j_sem=JS,
                                j_geo=2, mode="range")
        idx_g, _ = select_tiles(m_g, s_g, m_s, s_s, t_real=hb.t_real,
                                k_tiles=KG, bm=BM, n_valid=B, j_sem=2,
                                j_geo=JS, mode="range")
        return idx_s, idx_g

    t_sel = C.timeit(select, *stats, iters=60)
    print(f"select x2 (standalone):  {t_sel:6.2f} ms")
    idx_s, idx_g = [jnp.asarray(np.asarray(x)) for x in select(*stats)]

    # --- stage 4: parts (sem + geo family kernels) ---
    def parts(q_cat, idx_s, idx_g):
        ps = _hier_parts_family_call(
            q_cat, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg, idx_s,
            hb.g_sem_cat, hb.g_sem_vw_lr, hb.z_sem, sem_d=hb.sem_d, bm=BM,
            bn=hb.bn, gpt=gpt_s, geo=False, lr=True, rr=1, lrr=hb.lr_rank)
        pg = _hier_parts_family_call(
            q_cat, hb.k_cat, hb.values, hb.value_scale, hb.mask_neg, idx_g,
            hb.g_geo_cat, hb.g_geo_vw, hb.z_geo, sem_d=hb.sem_d, bm=BM,
            bn=hb.bn, gpt=gpt_g, geo=True, lr=False, rr=1)
        return ps, pg

    jparts = jax.jit(parts)
    t_parts = C.timeit(jparts, q_cat, idx_s, idx_g, iters=50)
    print(f"parts sem+geo:           {t_parts:6.2f} ms")
    ps, pg = [jnp.asarray(np.asarray(x)) for x in jparts(q_cat, idx_s, idx_g)]

    # --- stage 5: combine (lr+rr unproject, normalize, blend, unsort) ---
    Dv = hb.value_dim
    Ws = hb.g_sem_vw_lr.shape[1]
    r, rrp = hb.lr_rank, hb.z_sem.shape[1]

    @jax.jit
    def combine(ps, pg, tails, inv):
        corr = tails[:, :Ws] - ps[:, rrp + 128:]
        acc_s = jnp.dot(ps[:, :rrp], hb.w_sem,
                        preferred_element_type=jnp.float32) + jnp.dot(
            corr[:, :r], hb.u_sem, preferred_element_type=jnp.float32)
        d_s = ps[:, rrp:rrp + 1] + corr[:, r:r + 1]
        acc_g = pg[:, :Dv] + tails[:, Ws:Ws + Dv] + jnp.dot(
            pg[:, Dv + 128:], hb.w_geo, preferred_element_type=jnp.float32)
        d_g = pg[:, Dv:Dv + 1] + tails[:, Ws + Dv:Ws + Dv + 1]
        sem = acc_s / jnp.maximum(d_s, 1e-30)
        geo = acc_g / jnp.maximum(d_g, 1e-30)
        out = 0.5 * sem + 0.5 * geo
        return out[inv[:B]]

    t_comb = C.timeit(combine, ps, pg, tails, inv, iters=60)
    print(f"combine+unsort:          {t_comb:6.2f} ms")

    # --- combine + concat with (sorted) query embedding + single unsort ---
    qs_sorted = jnp.asarray(np.asarray(q))[:, :]

    @jax.jit
    def combine_cat(ps, pg, tails, inv, q_sorted):
        corr = tails[:, :Ws] - ps[:, rrp + 128:]
        acc_s = jnp.dot(ps[:, :rrp], hb.w_sem,
                        preferred_element_type=jnp.float32) + jnp.dot(
            corr[:, :r], hb.u_sem, preferred_element_type=jnp.float32)
        d_s = ps[:, rrp:rrp + 1] + corr[:, r:r + 1]
        acc_g = pg[:, :Dv] + tails[:, Ws:Ws + Dv] + jnp.dot(
            pg[:, Dv + 128:], hb.w_geo, preferred_element_type=jnp.float32)
        d_g = pg[:, Dv:Dv + 1] + tails[:, Ws + Dv:Ws + Dv + 1]
        sem = acc_s / jnp.maximum(d_s, 1e-30)
        geo = acc_g / jnp.maximum(d_g, 1e-30)
        out = jnp.concatenate([0.5 * sem + 0.5 * geo,
                               jnp.pad(q_sorted, ((0, 0), (0, 0)))], axis=1)
        return out[inv[:B]]

    t_cc = C.timeit(combine_cat, ps, pg, tails, inv, qs_sorted, iters=60)
    print(f"combine+concat+unsort:   {t_cc:6.2f} ms")

    total = t_ps + t_scan + t_parts + t_comb
    print(f"stage sum (no select):   {total:6.2f} ms vs full {t_full:6.2f}"
          f" -> in-graph overlap/overhead {t_full - total:+.2f}")


if __name__ == "__main__":
    main()
