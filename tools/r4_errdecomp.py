"""Round-4 feature-error DECOMPOSITION: what actually drives the p99?

The adaptive rescue measured that selection coverage is NOT it (10x wider
selection for the worst-coverage 10% of queries moved p99 10.79 -> 10.67%
while max dropped 55 -> 45%: the per-QUERY tail is coverage, the
per-ELEMENT p99 is something else).  Candidates, each isolated on the
flagship bank/config (K32/j3/kg16):

  res_rank truncation   build with res_rank=0 (parts stream exact values)
  lr_rank truncation    build with lr_rank=0 (full-width fine sem tail)
  tail granularity      gsz_sem 16 -> 8 (2x finer tail)
  all three relaxed     res 0 + lr 0 + gsz 8 == the remaining error is
                        pure unselected-tile group-tail approximation

Also prints the p99 split by |ref| magnitude (the relerr denominator is
max(|ref|, 0.1): if the tail concentrates in small-|ref| elements, it is
a NOISE FLOOR, not a retrieval defect).
"""
import _tpu_common as C
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from range_tpu.ops.retrieval import retrieve as retrieve_ref
    from range_tpu.ops.retrieval_hier import prepare_hier_bank, retrieve_hier

    print("device:", jax.devices()[0], flush=True)
    bank, q, q_xyz = C.standard_fixture()
    ref = np.asarray(retrieve_ref(q, q_xyz, bank, sem_temp=12.0,
                                  geo_temp=40.0, beta=0.5, chunk=4096))
    den = np.maximum(np.abs(ref), 1e-1)
    kw = dict(k_tiles=32, j_sem=3, k_geo=16, scan_bm=512)

    def report(tag, hb, **extra):
        out = np.asarray(retrieve_hier(q, q_xyz, hb, **{**kw, **extra}))
        rel = np.abs(out - ref) / den
        small = np.abs(ref) < 0.1
        print(f"{tag:42s} mean {rel.mean()*100:5.2f}% "
              f"p99 {np.percentile(rel, 99)*100:5.2f}% "
              f"max {rel.max()*100:5.1f}% | big-|ref| p99 "
              f"{np.percentile(rel[~small], 99)*100:5.2f}% "
              f"small-|ref| p99 {np.percentile(rel[small], 99)*100:5.2f}% "
              f"(small frac {small.mean():.2f})", flush=True)

    base = dict(bn=512, gsz_sem=16, gsz_geo=64, lr_rank=256, res_rank=128,
                topk_gsz=8, seed=0)
    hb = prepare_hier_bank(bank, cache_path="/tmp/range_bench_hier_cache.npz",
                           **base)
    report("flagship (res128 lr256 gsz16)", hb)
    for tag, delta in (
        ("no res_rank (exact value stream)", dict(res_rank=0)),
        ("no lr_rank (full fine tail)", dict(lr_rank=0)),
        ("res256", dict(res_rank=256)),
        ("lr384", dict(lr_rank=384)),
        ("gsz8 tail", dict(gsz_sem=8, topk_gsz=0)),
        ("all relaxed (res0 lr0 gsz8)",
         dict(res_rank=0, lr_rank=0, gsz_sem=8, topk_gsz=0)),
    ):
        cfg = {**base, **delta}
        try:
            hb_v = prepare_hier_bank(
                bank,
                cache_path=f"/tmp/r4_ed_{tag.split()[0].strip('(')}.npz",
                **cfg)
            print(f"built {tag}", flush=True)
            report(tag, hb_v)
        except Exception as e:  # e.g. full-width scan VMEM at this shape
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
