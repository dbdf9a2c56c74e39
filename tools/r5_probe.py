"""Round 5: HD probe battery for the flagship cost-cut candidates.

Round 5a-c measured the throughput levers the VERDICT proposed and
rejected them (PERF.md).  What remains are SERVING-knob cuts whose only
open question is the downstream probe bar (within 0.005 of dense on the
Dv=1024 active-truncation bank — the same battery as round 4):

  * hier_bm=512: parts dispatches run ~37% more row-eq/s at bm=512
    (r5_dedup2) and relerr stays in-bar (3.01% mean, round 3c) — the
    probe was never measured;
  * k_geo=8: saves ~0.4 ms (kg4 starved the geo family in r3a; kg8 was
    flagged "needs its probe checked" since round 3b);
  * k_tiles=24/kg12: -25% parts work, relerr ~3% expected;
  * the combination bm512 + kg8.

Same process structure as probe_parity_hd.py (one subprocess per config —
the known-safe pattern on the tunneled worker); shares its Dv=1024 bank
and flagship cache.
"""
import json
import os
import subprocess
import sys
import time

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


BANK_NPZ = "/tmp/r4_hd_bank.npz"
HIER_CACHE = "/tmp/r4_hd_hier_cache.npz"
CONFIGS = {
    "dense": {},
    "flagship": dict(profile="flagship"),
    "fl_bm512": dict(profile="flagship", hier_bm=512),
    "fl_kg8": dict(profile="flagship", k_geo=8),
    "fl_k24": dict(profile="flagship", k_tiles=24, k_geo=12),
    "fl_bm512_kg8": dict(profile="flagship", hier_bm=512, k_geo=8),
}


def run_embed(name):
    import _tpu_common as C  # noqa: F401
    import numpy as np
    import range_tpu
    from probe_parity_hd import build_bank_arrays, sample_points
    from range_tpu.bank.bank import GeoBank
    from range_tpu.data.checkerboard import fibonacci_lattice

    build_bank_arrays()
    d = np.load(BANK_NPZ)
    bank = GeoBank.from_arrays(d["locs"], d["keys"], d["values"],
                               pad_to=4096)
    lap(f"{name}: bank loaded")
    kw = dict(CONFIGS[name])
    if kw.get("profile") == "flagship":
        kw["hier_cache"] = HIER_CACHE  # serving knobs share the build
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, **kw)
    lap(f"{name}: encoder ready")
    s_lon, s_lat, s_lab = fibonacci_lattice(100, 16)
    train_pts, train_y = sample_points(16384, 21, s_lon, s_lat, s_lab)
    eval_pts, eval_y = sample_points(8192, 22, s_lon, s_lat, s_lab)

    def embed(pts):
        outs = []
        for lo in range(0, len(pts), 8192):
            outs.append(np.asarray(enc(pts[lo:lo + 8192])))
        return np.concatenate(outs, 0)

    tr, ev = embed(train_pts), embed(eval_pts)
    np.savez(f"/tmp/r5_hd_emb_{name}.npz", tr=tr, try_=train_y, ev=ev,
             evy=eval_y)
    lap(f"{name}: embeds saved")


def main():
    for name in CONFIGS:
        out = f"/tmp/r5_hd_emb_{name}.npz"
        for attempt in range(4):
            if os.path.exists(out):
                break
            r = subprocess.run([sys.executable, os.path.abspath(__file__),
                                "--embed", name])
            if r.returncode == 0 and os.path.exists(out):
                break
            lap(f"{name}: attempt {attempt} failed (rc={r.returncode}); "
                f"retrying in 60s")
            time.sleep(60)
        else:
            raise RuntimeError(f"{name}: all embed attempts failed")
        lap(f"{name}: embeds ready")
    results = {}
    for name in CONFIGS:
        import numpy as np
        from range_tpu.eval.probe import evaluate_arrays

        d = np.load(f"/tmp/r5_hd_emb_{name}.npz")
        acc = evaluate_arrays(d["tr"], d["try_"], d["ev"], d["evy"],
                              "checker_100")
        results[name] = float(acc)
        lap(f"{name}: probe acc {acc:.4f}")
    for name in CONFIGS:
        if name != "dense":
            print(f"{name}: delta vs dense {results[name] - results['dense']:+.4f}"
                  f" (bar: within 0.005)", flush=True)
    print(json.dumps({"r5_hd_probe": results}), flush=True)
    lap("DONE")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    if "--embed" in sys.argv:
        run_embed(sys.argv[sys.argv.index("--embed") + 1])
    else:
        main()
