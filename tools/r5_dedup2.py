"""Round 5, exp 2b: isolate WHY merged parts dispatches measured slower.

r5_dedup.py: dedup f=2 (bm_p=512, ku=53) ran 4.87-5.05 ms vs the 3.88 ms
baseline despite ~17% less dispatch work.  Suspects: (a) the pl.when
dedup-padding guard wrapping the kernel body (now static-gated off for
non-dedup shapes), (b) the bm=512 block shape itself (per-step VMEM up,
pipelining depth down).  This times _hier_parts_family_call STANDALONE on
the flagship sem shape with controlled index lists:

    A  bm=256, K=32, no guard      (the baseline shape)
    B  bm=256, K=32, guard on      (guard cost at the baseline shape)
    C  bm=512, K=64, guard on      (pure block-merge, no dedup saving)
    D  bm=512, K=53, guard on      (the dedup operating point)
    E  bm=512, K=32, guard on      (half work at merged shape)
    F  bm=128, K=32, no guard      (smaller blocks, same work)

If C ~= 2x A's per-dispatch cost (equal total), the merge is free and D
must win; if C >> that, bm=512 is intrinsically inefficient and the dedup
lever needs a different dispatch shape.
"""
import numpy as np

import _tpu_common as C

import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval_hier import (
        _hier_parts_family_call, _hybrid_order, _pad_queries, load_hier_bank)
    from range_tpu.ops.retrieval_pallas import pack_queries

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    B = q.shape[0]
    hb = load_hier_bank("/tmp/range_bench_hier_cache.npz")
    q_s, q_x = _pad_queries(q, q_xyz, hb, 1024)
    q_cat = pack_queries(q_s, q_x, 12.0, 40.0, tier=hb.tier)
    order = _hybrid_order(q_x, jnp.zeros(q_cat.shape[0], jnp.int32), B,
                          hb.t_pad, sort="geo")
    q_cat = q_cat[order]
    Bp = q_cat.shape[0]
    gpt_s = hb.bn // hb.gsz_sem
    rng = np.random.default_rng(0)

    def rand_idx(nB, K):
        # distinct per row (no consecutive dups -> guard never skips)
        return jnp.asarray(np.stack([
            rng.permutation(hb.t_real)[:K] for _ in range(nB)]), jnp.int32)

    def run(tag, bm, K, guard):
        idx = rand_idx(Bp // bm, K)
        kw = dict(sem_d=hb.sem_d, bm=bm, bn=hb.bn, gpt=gpt_s, geo=False,
                  lr=True, rr=1, lrr=hb.lr_rank, dedup_pad=guard)
        ms = C.timeit(_hier_parts_family_call, q_cat, hb.k_cat, hb.values,
                      hb.value_scale, hb.mask_neg, idx, hb.g_sem_cat,
                      hb.g_sem_vw_lr, hb.z_sem, iters=50, **kw)
        work = Bp // bm * K * bm  # query-tile-dispatch row equivalents
        print(f"{tag:34s} {ms:6.2f} ms  ({work/1e6:.2f}M row-eq, "
              f"{work/ms*1e3/1e9:.2f}G row-eq/s)", flush=True)

    run("A bm=256 K=32 no-guard", 256, 32, False)
    run("B bm=256 K=32 guard", 256, 32, True)
    run("C bm=512 K=64 guard", 512, 64, True)
    run("D bm=512 K=53 guard", 512, 53, True)
    run("E bm=512 K=32 guard", 512, 32, True)
    run("F bm=128 K=32 no-guard", 128, 32, False)
    run("G bm=1024 K=53 guard", 1024, 53, True)


if __name__ == "__main__":
    main()
