"""Encoder zoo: CSP parity vs the reference torch stack, GeoCLIP/SINR shapes
and converter round-trips, registry coverage of all reference names."""

import dataclasses
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import range_tpu
from range_tpu.models.csp import (CspConfig, CspLocationEncoder,
                                  csp_params_from_state_dict)


def _coords(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1)


def _load_ref_csp():
    """Import the reference CSP modules (module.py, SpatialRelationEncoder,
    models.py) with stubs for their heavyweight deps."""
    if "refcsp.models" in sys.modules:
        return sys.modules["refcsp.models"]
    base = "/root/reference/range/location_models/csp/main"
    pkg = types.ModuleType("refcsp")
    pkg.__path__ = [base]
    sys.modules["refcsp"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(f"refcsp.{name}", f"{base}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refcsp.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("data_utils")
    load("module")
    # SpatialRelationEncoder imports `from module import ...` (flat imports);
    # alias them
    sys.modules["module"] = sys.modules["refcsp.module"]
    sys.modules["data_utils"] = sys.modules["refcsp.data_utils"]
    load("SpatialRelationEncoder")
    sys.modules["SpatialRelationEncoder"] = sys.modules["refcsp.SpatialRelationEncoder"]
    return load("models")


def test_csp_gridcell_parity():
    """Same weights => same features as the reference torch CSP path."""
    ref_models = _load_ref_csp()
    ref_sre = sys.modules["refcsp.SpatialRelationEncoder"]
    ref_module = sys.modules["refcsp.module"]

    torch.manual_seed(0)
    cfg = CspConfig(spa_enc_type="gridcell", num_filts=64, num_classes=10,
                    frequency_num=8, max_radius=360.0, min_radius=0.1,
                    spa_f_act="gelu", num_hidden_layer=1, hidden_dim=128,
                    use_layn=True, skip_connection=True, dropout=0.5)
    ffn = ref_module.MultiLayerFeedForwardNN(
        input_dim=32, output_dim=64, num_hidden_layers=1, dropout_rate=0.5,
        hidden_dim=128, activation="gelu", use_layernormalize=True,
        skip_connection=True)
    spa = ref_sre.GridCellSpatialRelationEncoder(
        64, coord_dim=2, frequency_num=8, max_radius=360.0, min_radius=0.1,
        ffn=ffn, device="cpu")
    # NB: the reference PE hard-casts to torch.FloatTensor (f32) regardless
    # of model dtype (SpatialRelationEncoder.py:186), so parity is at f32.
    ref = ref_models.LocationEncoder(spa_enc=spa, num_inputs=2, num_classes=10,
                                     num_filts=64).eval()
    sd = {f"loc_enc.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params = csp_params_from_state_dict(sd, cfg, jnp.float32)
    ours = CspLocationEncoder(cfg)

    coords = _coords(16)
    with torch.no_grad():
        expect = ref(torch.tensor(coords, dtype=torch.float32), return_feats=True).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_csp_theory_parity():
    ref_models = _load_ref_csp()
    ref_sre = sys.modules["refcsp.SpatialRelationEncoder"]
    ref_module = sys.modules["refcsp.module"]

    torch.manual_seed(1)
    cfg = CspConfig(spa_enc_type="theory", num_filts=32, num_classes=5,
                    frequency_num=8, max_radius=360.0, min_radius=0.1,
                    spa_f_act="relu", num_hidden_layer=1, hidden_dim=64,
                    use_layn=False, skip_connection=False)
    ffn = ref_module.MultiLayerFeedForwardNN(
        input_dim=48, output_dim=32, num_hidden_layers=1, dropout_rate=0.5,
        hidden_dim=64, activation="relu")
    spa = ref_sre.TheoryGridCellSpatialRelationEncoder(
        32, coord_dim=2, frequency_num=8, max_radius=360.0, min_radius=0.1,
        ffn=ffn, device="cpu")
    ref = ref_models.LocationEncoder(spa_enc=spa, num_inputs=2, num_classes=5,
                                     num_filts=32).eval()
    sd = {f"loc_enc.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params = csp_params_from_state_dict(sd, cfg, jnp.float32)
    ours = CspLocationEncoder(cfg)
    coords = _coords(16, seed=1)
    with torch.no_grad():
        expect = ref(torch.tensor(coords, dtype=torch.float32), return_feats=True).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_csp_checkpoint_roundtrip(tmp_path):
    """Write a reference-format .pth.tar and load through our torch-free
    loader (load_csp.py contract: {'params', 'state_dict'})."""
    ref_models = _load_ref_csp()
    ref_sre = sys.modules["refcsp.SpatialRelationEncoder"]
    ref_module = sys.modules["refcsp.module"]
    torch.manual_seed(2)
    ffn = ref_module.MultiLayerFeedForwardNN(
        input_dim=32, output_dim=64, num_hidden_layers=1, dropout_rate=0.5,
        hidden_dim=128, activation="gelu", use_layernormalize=True,
        skip_connection=True)
    spa = ref_sre.GridCellSpatialRelationEncoder(
        64, coord_dim=2, frequency_num=8, max_radius=360.0, min_radius=0.1,
        ffn=ffn, device="cpu")
    loc_enc = ref_models.LocationEncoder(spa_enc=spa, num_inputs=2,
                                         num_classes=10, num_filts=64).eval()
    model = ref_models.LocationImageEncoder(
        loc_enc=loc_enc, train_loss="full_loss", unsuper_loss="contsoftmax",
        cnn_feat_dim=128, spa_enc_type="gridcell").eval()
    params = dict(spa_enc_type="gridcell", num_loc_feats=2, num_classes=10,
                  num_filts=64, num_users=1, device="cpu", frequency_num=8,
                  max_radius=360.0, min_radius=0.1, freq_init="geometric",
                  spa_f_act="gelu", num_hidden_layer=1, hidden_dim=128,
                  use_layn=True, skip_connection=True, dropout=0.5,
                  map_range=(-180, 180, -90, 90), train_loss="full_loss",
                  unsuper_loss="contsoftmax", cnn_feat_dim=128)
    path = str(tmp_path / "csp_test.pth.tar")
    torch.save({"params": params, "state_dict": model.state_dict()}, path)

    from range_tpu.models.csp import load_csp

    enc, jparams = load_csp(path)
    coords = _coords(8, seed=2)
    with torch.no_grad():
        expect = model(torch.tensor(coords, dtype=torch.float32),
                       return_feats=True).numpy()
    got = np.asarray(enc.apply(jparams, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_geoclip_shapes_and_registry():
    enc = range_tpu.load_model("GeoCLIP")
    out = enc(_coords(8))
    assert out.shape == (8, 512)
    assert np.all(np.isfinite(np.asarray(out)))
    tb = range_tpu.load_model("TaxaBind")
    assert tb.embedding_dim == 512


def test_geoclip_equal_earth_sanity():
    from range_tpu.models.geoclip import equal_earth_projection

    pts = jnp.asarray([[0.0, 0.0], [45.0, 90.0], [-60.0, -120.0]])
    xy = np.asarray(equal_earth_projection(pts))
    assert np.all(np.isfinite(xy))
    np.testing.assert_allclose(xy[0], [0.0, 0.0], atol=1e-5)  # origin maps to origin


def test_sinr_shapes():
    enc = range_tpu.load_model("SINR")
    out = enc(_coords(8, seed=3))
    assert out.shape == (8, 256)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sinr_state_dict_block_order_numeric():
    """feats.10 must sort after feats.2 (numeric, not lexicographic)."""
    from range_tpu.models.sinr import sinr_params_from_state_dict

    depth = 12
    sd = {"feats.0.weight": np.zeros((4, 2)), "feats.0.bias": np.zeros(4)}
    for i in range(depth):
        k = 2 + i  # reference layout: blocks live at feats.2..feats.(depth+1)
        sd[f"feats.{k}.w1.weight"] = np.full((4, 4), float(i))
        sd[f"feats.{k}.w1.bias"] = np.zeros(4)
        sd[f"feats.{k}.w2.weight"] = np.full((4, 4), float(i))
        sd[f"feats.{k}.w2.bias"] = np.zeros(4)
    params = sinr_params_from_state_dict(sd)
    got = [float(np.asarray(b["w1"]["w"])[0, 0]) for b in params["res"]]
    assert got == [float(i) for i in range(depth)], got


def test_full_reference_name_coverage():
    """Every encoder family the reference dispatcher supports
    (range.py:76-197) resolves in our registry."""
    names = range_tpu.list_models()
    for required in ["RANGE", "RANGE+", "SatCLIP", "GeoCLIP", "TaxaBind", "CSP",
                     "CSP_INat", "SINR", "Direct", "Cartesian_3D", "Theory",
                     "Wrap", "s2vec_spherem", "s2vec_spherec",
                     "s2vec_spheremplus", "s2vec_spherecplus", "s2vec_grid"]:
        assert required in names, required


def test_csp_rff_parity():
    """RFF encoder vs reference: dirvec/shift restored from the state dict."""
    ref_models = _load_ref_csp()
    ref_sre = sys.modules["refcsp.SpatialRelationEncoder"]
    ref_module = sys.modules["refcsp.module"]
    torch.manual_seed(5)
    np.random.seed(5)
    cfg = CspConfig(spa_enc_type="rff", num_filts=32, num_classes=4,
                    frequency_num=16, rbf_kernal_size=2.0,
                    spa_f_act="relu", num_hidden_layer=1, hidden_dim=64,
                    use_layn=False, skip_connection=False)
    ffn = ref_module.MultiLayerFeedForwardNN(
        input_dim=16, output_dim=32, num_hidden_layers=1, dropout_rate=0.5,
        hidden_dim=64, activation="relu")
    spa = ref_sre.RFFSpatialRelationEncoder(
        32, coord_dim=2, frequency_num=16, rbf_kernal_size=2.0,
        extent=(-180, 180, -90, 90), ffn=ffn, device="cpu")
    ref = ref_models.LocationEncoder(spa_enc=spa, num_inputs=2, num_classes=4,
                                     num_filts=32).eval()
    sd = {f"loc_enc.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params = csp_params_from_state_dict(sd, cfg, jnp.float32)
    ours = CspLocationEncoder(cfg)
    coords = _coords(16, seed=5)
    with torch.no_grad():
        expect = ref(torch.tensor(coords, dtype=torch.float32),
                     return_feats=True).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_csp_hexagon_and_rbf():
    """Hexagon PE matches the reference's per-element math; RBF produces
    valid gaussian responses around its anchors."""
    from range_tpu.models.csp import hexagon_embed, rbf_embed

    coords = np.array([[10.0, 20.0], [-50.0, 5.0]])
    F, R = 4, 360.0
    got = np.asarray(hexagon_embed(jnp.asarray(coords), F, R))
    # reference cal_coord_embed (SpatialRelationEncoder.py:390-406)
    import math as m
    expect = []
    for row in coords:
        e = []
        for c in row:
            for f in range(F):
                ang = c / (R ** (f / (F - 1)))
                e += [m.sin(ang), m.sin(ang + 2 * m.pi / 3), m.sin(ang + 4 * m.pi / 3)]
        expect.append(e)
    np.testing.assert_allclose(got, np.asarray(expect), rtol=1e-5, atol=1e-6)

    anchors = jnp.asarray([[0.0, 0.0], [100.0, 50.0]])
    r = np.asarray(rbf_embed(jnp.asarray(coords), anchors, kernel_size=30.0))
    assert r.shape == (2, 2)
    assert np.all((r > 0) & (r <= 1))
    # closer anchor responds more
    assert r[0, 0] > r[0, 1]

    # full encoder paths run
    enc_h = CspLocationEncoder(CspConfig(spa_enc_type="hexagridcell",
                                         num_filts=16, frequency_num=4,
                                         hidden_dim=32, use_layn=False,
                                         skip_connection=False))
    p = enc_h.init(jax.random.PRNGKey(0))
    out = enc_h.apply(p, jnp.asarray(coords, jnp.float32))
    assert out.shape == (2, 16)

    enc_r = CspLocationEncoder(CspConfig(spa_enc_type="rbf", num_filts=16,
                                         frequency_num=8, rbf_kernal_size=30.0,
                                         hidden_dim=32, use_layn=False,
                                         skip_connection=False))
    train_locs = np.random.default_rng(0).uniform(-90, 90, (50, 2))
    p = enc_r.init(jax.random.PRNGKey(1), train_locs=train_locs)
    out = enc_r.apply(p, jnp.asarray(coords, jnp.float32))
    assert out.shape == (2, 16)


def test_csp_theorydiag_parity():
    """theorydiag: block-diagonal post_mat contraction, no FFN
    (SpatialRelationEncoder.py:749-906)."""
    ref_sre = _load_ref_csp() and sys.modules["refcsp.SpatialRelationEncoder"]
    torch.manual_seed(5)
    spa = ref_sre.TheoryDiagGridCellSpatialRelationEncoder(
        64, coord_dim=2, frequency_num=8, max_radius=360.0, min_radius=0.1,
        dropout=0.5, f_act="sigmoid", freq_init="geometric",
        use_post_mat=False, device="cpu").eval()

    cfg = CspConfig(spa_enc_type="theorydiag", num_filts=64, num_classes=10,
                    frequency_num=8, max_radius=360.0, min_radius=0.1,
                    spa_f_act="sigmoid", dropout=0.5)
    enc = CspLocationEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    params["post_mat"] = jnp.asarray(spa.post_mat.detach().numpy())

    rng = np.random.default_rng(6)
    coords = np.stack([rng.uniform(-180, 180, 16), rng.uniform(-90, 90, 16)], 1)
    with torch.no_grad():
        ref = spa(coords[:, None, :]).numpy()[:, 0]
    ours = np.asarray(enc.features(params, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    # use_post_mat variant round-trips through the extra linear
    torch.manual_seed(7)
    spa2 = ref_sre.TheoryDiagGridCellSpatialRelationEncoder(
        64, coord_dim=2, frequency_num=8, max_radius=360.0, min_radius=0.1,
        dropout=0.5, f_act="sigmoid", freq_init="geometric",
        use_post_mat=True, device="cpu").eval()
    cfg2 = dataclasses.replace(cfg, use_post_mat=True)
    enc2 = CspLocationEncoder(cfg2)
    p2 = enc2.init(jax.random.PRNGKey(1))
    p2["post_mat"] = jnp.asarray(spa2.post_mat.detach().numpy())
    p2["post_linear"] = {
        "w": jnp.asarray(spa2.post_linear.weight.detach().numpy().T),
        "b": jnp.asarray(spa2.post_linear.bias.detach().numpy())}
    with torch.no_grad():
        ref2 = spa2(coords[:, None, :]).numpy()[:, 0]
    ours2 = np.asarray(enc2.features(p2, jnp.asarray(coords, jnp.float32)))
    np.testing.assert_allclose(ours2, ref2, rtol=2e-5, atol=2e-5)


def test_tangnet_parity():
    """TangNet location-context baseline (csp/main/models.py:83-112)."""
    ref_models = _load_ref_csp()
    from range_tpu.models.csp import apply_tangnet, init_tangnet

    torch.manual_seed(8)
    net = ref_models.TangNet(ip_loc_dim=20, feats_dim=32, loc_dim=16,
                             num_classes=10, use_loc=True).eval()
    params = init_tangnet(jax.random.PRNGKey(0), 20, 32, 16, 10)
    params["fc_loc"] = {"w": jnp.asarray(net.fc_loc.weight.detach().numpy().T),
                        "b": jnp.asarray(net.fc_loc.bias.detach().numpy())}
    params["fc_class"] = {
        "w": jnp.asarray(net.fc_class.weight.detach().numpy().T),
        "b": jnp.asarray(net.fc_class.bias.detach().numpy())}
    rng = np.random.default_rng(9)
    loc = np.eye(20, dtype=np.float32)[rng.integers(0, 20, 8)]
    feat = rng.standard_normal((8, 32)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(loc), torch.from_numpy(feat)).numpy()
    ours = np.asarray(apply_tangnet(params, jnp.asarray(loc), jnp.asarray(feat)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)
    # no-loc variant ignores the grid input
    p2 = init_tangnet(jax.random.PRNGKey(1), 20, 32, 16, 10, use_loc=False)
    out2 = apply_tangnet(p2, jnp.asarray(loc), jnp.asarray(feat))
    np.testing.assert_allclose(np.exp(np.asarray(out2)).sum(1), 1.0, rtol=1e-5)
