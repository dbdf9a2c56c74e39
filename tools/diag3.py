import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from range_tpu.bank.bank import GeoBank
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder
from range_tpu.ops.retrieval import exact_nn
from range_tpu.ops.retrieval_hier import build_hier_bank

bank = GeoBank.synthetic_informative(0, 100_000, pad_to=4096, value_dtype=jnp.bfloat16)
hb = build_hier_bank(bank, bn=512, gsz_sem=8, gsz_geo=64, tier="fast", seed=0)
rng = np.random.default_rng(1)
B = 2048
coords = jnp.asarray(np.stack([rng.uniform(-180, 180, B), np.degrees(np.arcsin(rng.uniform(-1, 1, B)))], 1), jnp.float32)
tower = SatClipLocationEncoder(SatClipLocationConfig())
tp = tower.init(jax.random.PRNGKey(0), dtype=jnp.float32)
q = np.asarray(tower.apply(tp, coords))
q = q / np.linalg.norm(q, axis=1, keepdims=True)
q_xyz = np.asarray(lonlat_deg_to_xyz(coords))

true = np.asarray(exact_nn(jnp.asarray(q), hb.bank, chunk=8192))
true_tile = true // hb.bn
mask = np.asarray(hb.bank.row_mask()) > 0
keys = np.asarray(hb.bank.keys_sem, np.float32); xyz = np.asarray(hb.bank.xyz, np.float32)
geo_true = np.argmax(np.where(mask[None,:], q_xyz @ xyz.T, -np.inf), axis=1)
geo_true_tile = geo_true // hb.bn
N = keys.shape[0]; T = N // hb.bn

def group_stats(feats, gsz):
    G = N // gsz
    f = feats.reshape(G, gsz, -1); m = mask.reshape(G, gsz).astype(np.float32)
    cnt = np.maximum(m.sum(1), 1)
    c = (f * m[:,:,None]).sum(1) / cnt[:,None]
    r = np.sqrt((((f - c[:,None,:])**2).sum(2)) * m + 0.0).max(1)
    return c, r, (m.sum(1) > 0)

def hits(score_tile, tt, name):
    # score_tile [B, T]; rank of true tile
    ranks = (score_tile > score_tile[np.arange(B), tt][:, None]).sum(1)
    out = " ".join(f"top{j}={(ranks<j).mean():.4f}" for j in (1,2,4,8,16))
    print(f"{name}: {out}", flush=True)

for gsz, fam, feats, qq, tt in ((8, "sem", keys, q, true_tile),
                                 (64, "sem", keys, q, true_tile),
                                 (8, "geo", xyz, q_xyz, geo_true_tile),
                                 (64, "geo", xyz, q_xyz, geo_true_tile)):
    c, r, nz = group_stats(feats, gsz)
    gpt = hb.bn // gsz
    sim = qq @ c.T  # [B, G]
    sim = np.where(nz[None,:], sim, -np.inf)
    cen = sim.reshape(B, T, gpt).max(2)
    ub = np.where(nz[None,:], sim + r[None,:], -np.inf).reshape(B, T, gpt).max(2)
    hits(cen, tt, f"{fam} gsz={gsz} centroid")
    hits(ub, tt, f"{fam} gsz={gsz} ub(c+r)")
