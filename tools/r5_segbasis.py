"""Round 5, exp 4: per-supergroup residual eigenbases — measure or reject.

The flagship p99 feature-error decomposition (PERF.md round 4d) leaves the
res_rank truncation as the largest single contributor (~3.8% of the 10.8%
p99 at rank 128).  ROADMAP's one untried structural idea: replace the ONE
global rank-k eigenbasis of the within-group value residuals with
per-SEGMENT bases (segment = bank tile or supergroup of tiles).

Serving cost reality check (ops/retrieval_hier._hier_parts_family_kernel):
the kernel accumulates az = p @ z ACROSS selected tiles, which is only
possible because every tile shares one unprojection basis.  Per-segment
bases force the [bm, k] @ [k, Dv] unprojection INSIDE the per-tile grid
step: +2*k*Dv flops per (query, tile) = +33% parts-sem flops at k=128,
Dv=1024, K=32 — vs res_rank=256's measured +13% for p99 -15%.  So
per-segment bases must capture MORE residual energy than global rank-256
at equal k=128 to even break even.  This tool measures exactly that on the
flagship 100k bank: residual energy capture of
  (a) global rank-k basis (the shipped design),
  (b) per-tile (512-row segment) rank-k bases,
  (c) per-supergroup (8-tile segment) rank-k bases,
for k in {64, 128, 256}, against the same serving group means.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import _tpu_common  # noqa: F401

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from range_tpu.ops.retrieval_hier import load_hier_bank

    hb = load_hier_bank("/tmp/range_bench_hier_cache.npz")
    bn, gsz = hb.bn, hb.gsz_sem
    vals = np.asarray(hb.values, np.float32)
    mask = (np.asarray(hb.mask_neg)[0] == 0.0).astype(np.float32)
    N, Dv = vals.shape
    G = N // gsz
    vals = vals * mask[:, None]
    # serving mean: the lr-projected group mean (exactly what the kernel
    # subtracts — build_hier_bank res_rank docstring)
    coef = np.asarray(hb.g_sem_vw_lr, np.float32)[:G, :hb.lr_rank]
    cnt = np.asarray(hb.g_sem_vw_lr, np.float32)[:G, hb.lr_rank]
    u = np.asarray(hb.u_sem, np.float32)
    vbar = (coef / np.maximum(cnt, 1.0)[:, None]) @ u
    R = (vals.reshape(G, gsz, Dv) - vbar[:, None, :]).reshape(N, Dv)
    R *= mask[:, None]
    tot = float((R ** 2).sum())
    print(f"bank: N={N} Dv={Dv} gsz={gsz}; residual energy {tot:.3e}",
          flush=True)

    def cap_global(k):
        gram = R.T @ R
        w, v = np.linalg.eigh(gram)
        return float(w[-k:].sum()) / tot

    def cap_seg(rows_per_seg, k):
        S = -(-N // rows_per_seg)
        cap = 0.0
        Rp = np.zeros((S * rows_per_seg, Dv), np.float32)
        Rp[:N] = R
        Rs = Rp.reshape(S, rows_per_seg, Dv)
        for s in range(S):
            gram = Rs[s].T @ Rs[s]
            w = np.linalg.eigvalsh(gram)
            cap += float(w[-k:].sum())
        return cap / tot

    for k in (64, 128, 256):
        g = cap_global(k)
        print(f"k={k:3d}: global {g:.4f}", flush=True)
    for k in (64, 128):
        pt = cap_seg(bn, k)                # per-tile (196 segments)
        ps = cap_seg(8 * bn, k)            # per-supergroup (8 tiles)
        print(f"k={k:3d}: per-tile {pt:.4f}  per-8-tile {ps:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
