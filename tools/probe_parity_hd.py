"""High-dimensional checkerboard-probe parity: the VERDICT r3 #2 bar.

The original probe (tools/probe_parity.py) builds 16-d one-hot values — on
that bank the flagship's rank truncations clamp to a complete basis
(res_rank=128 >= Dv=16, lr_rank=256 >= Dv), so the probe never exercises
the approximations the throughput number is measured with.  This probe
builds **Dv=1024** structured values in which the truncations are ACTIVE:

  value_row = R[label]            (one-hot rotated into 1024-d: 16 random
                                   orthonormal class directions)
            + 0.5 * smooth(loc)   (spectral mixture: 256 random spherical
                                   frequencies of the row's xyz, projected
                                   to 1024-d — locally smooth, globally
                                   high-rank across the bank)
            + 0.3 * noise         (full-width i.i.d. — inflates the
                                   within-group residuals res_rank must
                                   truncate)

so lr_rank=256 genuinely truncates the group-value-sum Gram basis and
res_rank=128 genuinely truncates the 1024-d within-group residuals, exactly
as they do on the bench bank.  The flagship-vs-dense probe gap on THIS bank
is the honest three-bars evidence (bar: within 0.005).

Process structure: one SUBPROCESS per encoder config (`--embed NAME`) —
building the dense + flagship + turbo encoders in one process is the known
fatal pattern on the tunneled worker (full encoder + extra jits, PERF.md).
The driver retries each config and evaluates the probes on CPU.
"""
import json
import os
import subprocess
import sys
import time

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


BANK_N = 102_400
N_SUPPORT, N_CLASSES, DV = 100, 16, 1024
BANK_NPZ = "/tmp/r4_hd_bank.npz"
HIER_CACHE = "/tmp/r4_hd_hier_cache.npz"
CONFIGS = {
    "dense": {},
    # the SHIPPED bundle, truncations ACTIVE (res128/lr256 on Dv=1024):
    # the headline three-bars probe row
    "flagship": dict(profile="flagship"),
    "turbo": dict(profile="turbo"),
    # round-4 adoption candidate: the low-rank GEO tail (retrieval 4.48 ->
    # 3.88 ms measured) — lr_geo truncates the geo family's group value
    # sums, which the checker probe leans on, so it must pass THIS probe
    # (where Dv=1024 makes the truncation active) before the profile
    # adopts it
    "flagship_lrg384": dict(profile="flagship", lr_geo=384),
}


def sample_points(n, seed, s_lon, s_lat, s_lab):
    import numpy as np
    from range_tpu.data.checkerboard import assign_closest_label

    r = np.random.default_rng(seed)
    lons = r.uniform(-180, 180, n)
    lats = np.degrees(np.arcsin(r.uniform(-1, 1, n)))
    labs = assign_closest_label(lons, lats, s_lon, s_lat, s_lab)
    return np.stack([lons, lats], 1).astype(np.float32), labs


def build_bank_arrays():
    """Bank keys (tower on device) + structured Dv=1024 values; cached."""
    import _tpu_common as C  # noqa: F401  (comp cache + sys.path)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from range_tpu.data.checkerboard import fibonacci_lattice
    from range_tpu.geometry import lonlat_deg_to_xyz
    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    if os.path.exists(BANK_NPZ):
        return
    rng = np.random.default_rng(3)
    s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)
    bank_locs, bank_labs = sample_points(BANK_N, 11, s_lon, s_lat, s_lab)
    tower = SatClipLocationEncoder(SatClipLocationConfig())
    tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    k = tower.apply(tp, jnp.asarray(bank_locs))
    k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
    k = k + 0.25 * jax.random.normal(jax.random.PRNGKey(5), k.shape)
    keys = np.asarray(k / jnp.linalg.norm(k, axis=1, keepdims=True))

    # class directions: one-hot rotated into DV dims (orthonormal via QR)
    R = np.linalg.qr(rng.standard_normal((DV, N_CLASSES)))[0].T  # [16, DV]
    # smooth spectral field: random spherical frequencies of xyz -> DV dims
    xyz = np.asarray(lonlat_deg_to_xyz(jnp.asarray(bank_locs)))
    W = rng.standard_normal((3, 256)) * 3.0                      # continental
    phase = rng.uniform(0, 2 * np.pi, 256)
    phi = np.sin(xyz @ W + phase)                                # [N, 256]
    P = rng.standard_normal((256, DV)).astype(np.float32) / np.sqrt(256)
    smooth = (phi @ P).astype(np.float32)
    values = (R[bank_labs] + 0.5 * smooth
              + 0.3 * rng.standard_normal((BANK_N, DV)).astype(np.float32))
    np.savez(BANK_NPZ, locs=bank_locs, keys=keys,
             values=values.astype(np.float32))
    lap(f"bank arrays built + cached: Dv={DV}")


def run_embed(name):
    """Subprocess body: one encoder config, embed train+eval, save npz."""
    import _tpu_common as C  # noqa: F401
    import numpy as np
    import range_tpu
    from range_tpu.bank.bank import GeoBank
    from range_tpu.data.checkerboard import fibonacci_lattice

    d = np.load(BANK_NPZ)
    bank = GeoBank.from_arrays(d["locs"], d["keys"], d["values"],
                               pad_to=4096)
    lap(f"{name}: bank loaded")
    kw = dict(CONFIGS[name])
    if kw.get("profile") in ("flagship", "turbo"):
        # flagship/turbo share build params -> shared cache; configs with
        # extra BUILD kwargs (lr_geo) get their own file (the signature
        # would rebuild-and-overwrite the shared one otherwise)
        kw["hier_cache"] = (HIER_CACHE if len(kw) == 1
                            else f"/tmp/r4_hd_hier_{name}.npz")
    enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, chunk=4096,
                               seed=0, **kw)
    lap(f"{name}: encoder ready")
    s_lon, s_lat, s_lab = fibonacci_lattice(N_SUPPORT, N_CLASSES)
    train_pts, train_y = sample_points(16384, 21, s_lon, s_lat, s_lab)
    eval_pts, eval_y = sample_points(8192, 22, s_lon, s_lat, s_lab)

    def embed(pts):
        outs = []
        for lo in range(0, len(pts), 8192):
            outs.append(np.asarray(enc(pts[lo:lo + 8192])))
        return np.concatenate(outs, 0)

    tr, ev = embed(train_pts), embed(eval_pts)
    np.savez(f"/tmp/r4_hd_emb_{name}.npz", tr=tr, try_=train_y, ev=ev,
             evy=eval_y)
    lap(f"{name}: embeds saved")


def main():
    # phase 1: all embeds via subprocesses (driver stays jax-free so the
    # children own the chip exclusively)
    for name in CONFIGS:
        out = f"/tmp/r4_hd_emb_{name}.npz"
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
    # phase 2: probes
    results = {}
    for name in CONFIGS:
        import numpy as np
        from range_tpu.eval.probe import evaluate_arrays

        d = np.load(f"/tmp/r4_hd_emb_{name}.npz")
        acc = evaluate_arrays(d["tr"], d["try_"], d["ev"], d["evy"],
                              "checker_100")
        results[name] = float(acc)
        lap(f"{name}: probe acc {acc:.4f}")

    delta = results["flagship"] - results["dense"]
    print(f"HD PARITY delta (flagship - dense, Dv=1024 active truncations): "
          f"{delta:+.4f} (bar: within 0.005)", flush=True)
    print(f"turbo delta: {results['turbo'] - results['dense']:+.4f}",
          flush=True)
    print(json.dumps({"hd_probe": results}), flush=True)
    lap("DONE")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (range_tpu)
    sys.path.insert(0, here)                   # _tpu_common
    if "--embed" in sys.argv:
        build_bank_arrays()
        run_embed(sys.argv[sys.argv.index("--embed") + 1])
    else:
        main()
