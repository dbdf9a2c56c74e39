import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-3 timing battery: the new serving mechanisms at 100k scale.

Measures on the real TPU, one process (tunnel discipline):
  T1  retrieve_hier e2e + feature relerr vs dense for: v1 default,
      v1+lr256, v1+lr256+asym(K=32 j3, k_geo=4) — the probe-parity
      candidate config;
  T2  hier_topk: v1 (K=56) vs two-level coarse->refine selection
      (gsz_super=64 bank, m_tiles) at matched recall;
  T3  small-batch crossover (VERDICT r2 #4): dense vs hier at B=512/2048
      with tail-leaning budgets (the joint tail carries fidelity without
      coherent selection).
Builds cache to /tmp (reused across runs).
"""
import functools
import time

import numpy as np

from _tpu_common import jax, jnp

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import (build_hier_bank, hier_topk,
                                          load_hier_bank, retrieve_hier,
                                          save_hier_bank,
                                          hier_build_signature,
                                          peek_hier_build)

BANK_N = 100_000
B = 10_240


def fence(out):
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))


def t(fn, *a, iters=10, **kw):
    f = functools.partial(fn, **kw) if kw else fn
    fence(f(*a))
    best = float("inf")
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        best = min(best, (time.perf_counter() - s) / iters)
    return best * 1e3


def get_bank(tag, **kw):
    path = f"/tmp/r3t_{tag}.npz"
    bank = get_bank.src
    sig = hier_build_signature(
        bank, bn=kw.get("bn", 512), gsz_sem=kw.get("gsz_sem", 8),
        gsz_geo=kw.get("gsz_geo", 64), tier="fast", seed=0, shards=1,
        gsz_super=kw.get("gsz_super", 0), lr_rank=kw.get("lr_rank", 0) or 0)
    if os.path.exists(path) and peek_hier_build(path) == sig:
        lap(f"bank {tag}: cache hit")
        return load_hier_bank(path)
    hb = build_hier_bank(bank, tier="fast", seed=0, **kw)
    save_hier_bank(hb, path, build=sig)
    lap(f"bank {tag}: built")
    return hb


def main():
    print("device:", jax.devices()[0], flush=True)
    bank = GeoBank.synthetic_informative(0, BANK_N, pad_to=4096,
                                         value_dtype=jnp.bfloat16)
    get_bank.src = bank
    rng = np.random.default_rng(1)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-180, 180, B),
         np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    q = tower.apply(tp, coords)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.float32)
    q_xyz = lonlat_deg_to_xyz(coords)
    lap("queries ready")

    # dense f32 reference on a subset (feature fidelity anchor)
    nref = 2048
    ref = np.asarray(retrieve(q[:nref], q_xyz[:nref], bank, sem_temp=12.0,
                              geo_temp=40.0, beta=0.5, chunk=4096))
    true = np.asarray(exact_nn(q, bank, chunk=4096))
    lap("dense reference ready")

    hb = get_bank("v1", bn=512, gsz_sem=8, gsz_geo=64)
    hb_lr = get_bank("lr256", bn=512, gsz_sem=8, gsz_geo=64, lr_rank=256)
    hb_sup = get_bank("sup64", bn=512, gsz_sem=8, gsz_geo=64, gsz_super=64)

    def relerr(hbx, **kw):
        out = np.asarray(retrieve_hier(q[:nref], q_xyz[:nref], hbx, bm=128,
                                       **kw))
        r = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-1)
        return float(r.mean()), float(np.percentile(r, 99))

    # ---- T1: feature path ----
    for tag, hbx, kw in (
            ("v1 K=16", hb, {}),
            ("lr256 K=16", hb_lr, {}),
            ("lr256 K=32 j3 kg4", hb_lr, dict(k_tiles=32, j_sem=3, k_geo=4)),
            ("v1 K=32 j3 kg4", hb, dict(k_tiles=32, j_sem=3, k_geo=4)),
    ):
        ms = t(retrieve_hier, q, q_xyz, hbx, **kw)
        rm, rp = relerr(hbx, **kw)
        lap(f"T1 {tag}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s  "
            f"relerr {rm:.4f}/{rp:.4f}")

    # ---- T2: topk path ----
    for tag, hbx, kw in (
            ("v1 K=56", hb, dict(k_tiles=56)),
            ("v1 K=40", hb, dict(k_tiles=40)),
            ("v1 bm128 K=32", hb, dict(k_tiles=32, bm=128)),
            ("v1 bm128 K=24", hb, dict(k_tiles=24, bm=128)),
            ("sup64 M=96 K=48", hb_sup, dict(k_tiles=48, m_tiles=96)),
            ("sup64 bm128 M=64 K=28", hb_sup, dict(k_tiles=28, m_tiles=64,
                                                   bm=128)),
    ):
        ms = t(hier_topk, q, q_xyz, hbx, **kw)
        got = np.asarray(hier_topk(q, q_xyz, hbx, **kw))
        rec = float((got == true).mean())
        lap(f"T2 {tag}: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s  recall {rec:.4f}")

    # ---- T3: small-batch crossover ----
    from range_tpu.ops.retrieval_pallas import retrieve_pallas

    for nb in (512, 2048):
        qs, qxs = q[:nb], q_xyz[:nb]
        refs = ref[:min(nb, nref)]
        ms_d = t(retrieve_pallas, qs, qxs, bank)
        out_h = {}
        for tag, kw in (("K4 kg2", dict(k_tiles=4, k_geo=2, j_sem=1,
                                        j_geo=1)),
                        ("K8 kg2", dict(k_tiles=8, k_geo=2, j_sem=2,
                                        j_geo=1))):
            ms_h = t(retrieve_hier, qs, qxs, hb_lr, bm=128, **kw)
            out = np.asarray(retrieve_hier(qs, qxs, hb_lr, bm=128, **kw))
            r = (np.abs(out[:len(refs)] - refs)
                 / np.maximum(np.abs(refs), 1e-1))
            lap(f"T3 B={nb} hier {tag}: {ms_h:.2f} ms "
                f"({nb/ms_h*1e3:,.0f} q/s) relerr {r.mean():.4f}")
        lap(f"T3 B={nb} dense: {ms_d:.2f} ms ({nb/ms_d*1e3:,.0f} q/s)")

    # ---- T4: autotune_hier at the serving geometry (tc=32 through the
    # compiler oracle; VERDICT r2 #5) ----
    import logging

    logging.basicConfig(level=logging.INFO)
    from range_tpu.ops.autotune import autotune_hier

    bm_t, tc_t = autotune_hier(q, q_xyz, hb_lr, k_tiles=32, j_sem=3)
    lap(f"T4 autotune_hier(lr256 geometry): bm={bm_t} tc={tc_t}")
    ms = t(retrieve_hier, q, q_xyz, hb_lr, k_tiles=32, j_sem=3, k_geo=4,
           bm=bm_t, tc=tc_t)
    lap(f"T4 tuned serving config: {ms:.2f} ms -> {B/ms*1e3:,.0f} q/s")


if __name__ == "__main__":
    main()
