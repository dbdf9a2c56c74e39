"""The SURVEY minimum-slice parity claim, as far as offline-possible: a
SatCLIP-ViT16-L40-SHAPED Lightning checkpoint (random weights, since the real
artifact is HF-hosted and unreachable) is written with torch, loaded through
our torch-free converter, and the FULL RANGE+ forward is compared against the
reference implementation running the same weights in torch.

Reference pieces exercised on the torch side: `get_satclip`
(`satclip/load.py:3-18`) -> SatCLIPLightningModule-shaped state dict ->
location tower (SH L=40 + SIREN), then a transcription of
`range/range.py:206-240` (normalize, dual softmax, beta blend, concat).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from range_tpu.bank.bank import GeoBank
from range_tpu.convert.satclip_ckpt import load_satclip_checkpoint
from range_tpu.geometry import lonlat_deg_to_xyz
from range_tpu.models.range_encoder import RangeConfig, RangeEncoder

sys.path.insert(0, "tests")
from reference_loader import load_reference_location_encoder

L = 40  # the released checkpoint's legendre_polys (satclip-vit16-L40)


def _fake_l40_ckpt(tmp_path):
    """Lightning-style ckpt with the released model's location-tower shape.
    harmonics_calculation='closed-form' because the analytic sympy table is
    stripped from the reference snapshot (the analytic convention itself is
    parity-tested against sympy in test_sh.py)."""
    ref_le = load_reference_location_encoder()
    torch.manual_seed(0)
    net = ref_le.SirenNet(dim_in=L * L, dim_hidden=256, dim_out=256,
                          num_layers=2).double()
    sd = {f"model.location.nnet.{k}": v for k, v in net.state_dict().items()}
    ckpt = {
        "hyper_parameters": dict(
            embed_dim=256, image_resolution=256, vision_layers=12,
            vision_width=768, vision_patch_size=16, in_channels=13,
            le_type="sphericalharmonics", pe_type="siren", frequency_num=16,
            max_radius=360, min_radius=1, legendre_polys=L,
            harmonics_calculation="closed-form", sh_embedding_dims=32,
            learning_rate=1e-4, weight_decay=0.01, num_hidden_layers=2,
            capacity=256, eval_downstream=True, air_temp_data_path="",
            election_data_path="",
        ),
        "state_dict": sd,
    }
    path = str(tmp_path / "satclip-l40-shaped.ckpt")
    torch.save(ckpt, path)
    return path, net


def test_full_range_plus_parity(tmp_path):
    ckpt_path, torch_net = _fake_l40_ckpt(tmp_path)

    # --- our side: torch-free load + jitted forward -------------------------
    tower, params = load_satclip_checkpoint(ckpt_path, dtype=jnp.float64)
    assert tower.config.legendre_polys == L
    rng = np.random.default_rng(0)
    n_bank, B = 1500, 64
    bank_locs = np.stack([rng.uniform(-180, 180, n_bank),
                          rng.uniform(-90, 90, n_bank)], 1)
    bank_keys = rng.standard_normal((n_bank, 256)).astype(np.float32)
    bank_vals = rng.standard_normal((n_bank, 1024)).astype(np.float32)
    bank = GeoBank.from_arrays(bank_locs, bank_keys, bank_vals, pad_to=256)
    enc = RangeEncoder(tower, bank, RangeConfig(mode="range+", beta=0.5,
                                                chunk=256, use_pallas=False))
    coords = np.stack([rng.uniform(-180, 180, B), rng.uniform(-88, 88, B)], 1)
    ours = np.asarray(enc.apply(params, jnp.asarray(coords, jnp.float64)))

    # --- reference side: torch tower + range.py:206-240 transcription ------
    ref_le = load_reference_location_encoder()
    refpe = sys.modules["refpe"]
    posenc = refpe.SphericalHarmonics(legendre_polys=L,
                                      harmonics_calculation="closed-form")
    ref_tower = ref_le.LocationEncoder(posenc, torch_net).double().eval()
    with torch.no_grad():
        q = ref_tower(torch.tensor(coords, dtype=torch.float64))
        q = q / q.norm(p=2, dim=-1, keepdim=True)  # range.py:212
        keys_n = torch.tensor(bank_keys / np.linalg.norm(bank_keys, axis=1,
                                                         keepdims=True))
        vals_t = torch.tensor(bank_vals)
        sem = torch.softmax(q.float() @ keys_n.t() * 12.0, dim=-1) @ vals_t
        db_xyz = torch.tensor(np.asarray(
            lonlat_deg_to_xyz(jnp.asarray(bank_locs, jnp.float64))),
            dtype=torch.float32)
        q_xyz = torch.tensor(np.asarray(
            lonlat_deg_to_xyz(jnp.asarray(coords, jnp.float64))),
            dtype=torch.float32)
        geo = torch.softmax(q_xyz @ db_xyz.t() * 40.0, dim=-1) @ vals_t
        blended = 0.5 * geo + 0.5 * sem  # range.py:238
        expect = np.concatenate([blended.numpy(), q.numpy()], axis=1)

    assert ours.shape == expect.shape == (B, 1280)
    # row-wise cosine parity (the SURVEY minimum-slice criterion: >= 0.999)
    num = np.sum(ours * expect, axis=1)
    den = np.linalg.norm(ours, axis=1) * np.linalg.norm(expect, axis=1)
    cos = num / den
    assert cos.min() > 0.9999, cos.min()
    np.testing.assert_allclose(ours, expect, rtol=1e-3, atol=1e-4)


def test_tower_only_parity_f64(tmp_path):
    """Tower outputs match the torch reference bit-close at f64 (L=40)."""
    ckpt_path, torch_net = _fake_l40_ckpt(tmp_path)
    tower, params = load_satclip_checkpoint(ckpt_path, dtype=jnp.float64)
    ref_le = load_reference_location_encoder()
    refpe = sys.modules["refpe"]
    posenc = refpe.SphericalHarmonics(legendre_polys=L,
                                      harmonics_calculation="closed-form")
    ref_tower = ref_le.LocationEncoder(posenc, torch_net).double().eval()
    rng = np.random.default_rng(1)
    coords = np.stack([rng.uniform(-180, 180, 256), rng.uniform(-89, 89, 256)], 1)
    with torch.no_grad():
        expect = ref_tower(torch.tensor(coords, dtype=torch.float64)).numpy()
    got = np.asarray(tower.apply(params, jnp.asarray(coords, jnp.float64)))
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-8)


def test_tower_f32_vs_f64_error_budget(tmp_path):
    """The f32 TPU tower stays within the retrieval softmax's sensitivity
    (models/satclip.py dtype policy)."""
    ckpt_path, _ = _fake_l40_ckpt(tmp_path)
    tower64, params64 = load_satclip_checkpoint(ckpt_path, dtype=jnp.float64)
    tower32, params32 = load_satclip_checkpoint(ckpt_path, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    coords = np.stack([rng.uniform(-180, 180, 512), rng.uniform(-89, 89, 512)], 1)
    hi = np.asarray(tower64.apply(params64, jnp.asarray(coords, jnp.float64)))
    lo = np.asarray(tower32.apply(params32, jnp.asarray(coords, jnp.float32)))

    def norm_rows(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    cos = np.sum(norm_rows(hi) * norm_rows(lo.astype(np.float64)), axis=1)
    assert cos.min() > 0.99999, cos.min()
