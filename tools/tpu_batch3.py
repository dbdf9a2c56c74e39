"""A/B: why did bench's hier feature fidelity collapse vs the sweep?"""
import time

from _tpu_common import standard_fixture, jax, jnp, np

t0 = time.time()


def lap(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


import range_tpu
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.ops.retrieval import exact_nn, retrieve
from range_tpu.ops.retrieval_hier import build_hier_bank, hier_nn, retrieve_hier

B = 10_240
bank, q_fix, qx_fix = standard_fixture(b=B)
lap("fixture")

# A: hb built directly (the sweep's path)
hb_a = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
lap("hb A")

# B: hb + queries through load_model (the bench's path)
enc = range_tpu.load_model("RANGE+", db_path=bank, beta=0.5, retrieval="hier",
                           chunk=4096, seed=0)
hb_b = enc.extra
lap("hb B (load_model)")

rng = np.random.default_rng(0)
_ = rng.uniform(-180, 180, 10000); _ = np.arcsin(rng.uniform(-1, 1, 10000))
qc = jnp.asarray(np.stack([rng.uniform(-180, 180, B),
                           np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1),
                 jnp.float32)
q_bench = enc.model.query_embedding(enc.params, qc)
qx_bench = lonlat_deg_to_xyz(qc)
lap("bench queries")

# tower alignment check: fixture tower vs load_model tower on same coords
q_fix_on_qc = None
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
qt = tower.apply(tp, qc)
qt = qt / jnp.linalg.norm(qt, axis=1, keepdims=True)
print("tower param match:", float(jnp.max(jnp.abs(qt - q_bench))), flush=True)

for name, hb, q, qx in (("A/fix", hb_a, q_fix, qx_fix),
                        ("A/bench", hb_a, q_bench, qx_bench),
                        ("B/bench", hb_b, q_bench, qx_bench),
                        ("B/fix", hb_b, q_fix, qx_fix)):
    true = np.asarray(exact_nn(q, hb.bank, chunk=4096))
    nn = np.asarray(hier_nn(q[:2048], qx[:2048], hb, k_tiles=16))
    rec = (nn == true[:2048]).mean()
    ref = retrieve(q[:2048], qx[:2048], hb.bank, sem_temp=12.0, geo_temp=40.0,
                   beta=0.5, chunk=4096)
    out = retrieve_hier(q[:2048], qx[:2048], hb)
    rel = np.abs(np.asarray(out) - np.asarray(ref)) / np.maximum(
        np.abs(np.asarray(ref)), 1e-1)
    print(f"{name}: hier_nn recall {rec:.4f}  relerr mean {rel.mean():.4f}",
          flush=True)
lap("DONE")
