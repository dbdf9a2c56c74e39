"""Eval harness: checkerboard fixture parity, TPU ridge vs sklearn, and the
CLI end-to-end on a synthetic task."""

import numpy as np
import pytest

from range_tpu.data import checkerboard as cb
from range_tpu.data.tasks import GeoTask, get_dataset, split_task
from range_tpu.eval.probe import evaluate_arrays, task_kind
from range_tpu.ops.ridge import ridge_probe


def test_checkerboard_matches_reference():
    """Sample-for-sample parity with the reference generator (same
    RandomState, same lattice math)."""
    import importlib.util, sys, types

    # the reference file imports lightning (uninstalled) but never uses it
    # in the code paths we exercise — stub it
    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        lightning.pytorch = types.ModuleType("lightning.pytorch")
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = lightning.pytorch

    spec = importlib.util.spec_from_file_location(
        "refchecker", "/root/reference/range/evaluation/checkerboarddataset.py")
    ref = importlib.util.module_from_spec(spec)
    sys.modules["refchecker"] = ref
    spec.loader.exec_module(ref)

    lon, lat, lab = cb.fibonacci_lattice(200, 16)
    rlon, rlat, rlab = ref.generate_fibonaccilattice(200, 16)
    np.testing.assert_allclose(lon, rlon, atol=1e-12)
    np.testing.assert_allclose(lat, rlat, atol=1e-12)
    np.testing.assert_array_equal(lab, rlab)

    coords, y = cb.sample_points(500, 200, 16, seed=0)
    rl, _, ry = ref.get_data(500, 200, 16, seed=0)
    np.testing.assert_allclose(coords, rl.numpy(), atol=1e-10)
    np.testing.assert_array_equal(y, ry.numpy())

    coords_g, y_g = cb.sample_points(500, 200, 16, grid=True)
    rg, _, ryg = ref.get_data(500, 200, 16, grid=True)
    np.testing.assert_allclose(coords_g, rg.numpy(), atol=1e-10)
    np.testing.assert_array_equal(y_g, ryg.numpy())


def _synth_cls(n=400, f=24, k=5, seed=0):
    centers = np.random.default_rng(99).standard_normal((k, f)) * 2  # shared
    rng = np.random.default_rng(seed)
    y = rng.integers(0, k, n)
    X = centers[y] + rng.standard_normal((n, f))
    return X, y


def test_ridge_classification_matches_sklearn():
    X, y = _synth_cls()
    Xv, yv = _synth_cls(n=200, seed=1)
    ours = ridge_probe(X, y, Xv, yv, "classification")
    skl = evaluate_arrays(X, y, Xv, yv, "biome", backend="sklearn")
    assert abs(ours - skl) < 0.05, (ours, skl)
    assert ours > 0.7


def test_ridge_regression_matches_sklearn():
    rng = np.random.default_rng(2)
    n, f = 500, 16
    w = rng.standard_normal(f)
    X = rng.standard_normal((n, f))
    y = X @ w + 0.1 * rng.standard_normal(n)
    Xv = rng.standard_normal((200, f))
    yv = Xv @ w + 0.1 * rng.standard_normal(200)
    ours = ridge_probe(X, y, Xv, yv, "regression")
    skl = evaluate_arrays(X, y, Xv, yv, "temperature", backend="sklearn")
    assert abs(ours - skl) < 0.02, (ours, skl)
    assert ours > 0.9


def test_task_kind_dispatch():
    assert task_kind("biome") == "classification"
    assert task_kind("checker_300") == "classification"
    assert task_kind("temperature") == "regression"
    with pytest.raises(NotImplementedError):
        task_kind("inat_1")


def test_checker_task_registry():
    tr, ev, ncls = get_dataset("checker_300")
    assert ncls == 16
    assert tr.coords.shape == (10000, 2)
    assert ev.kind == "classification"


def test_split_task_deterministic():
    t = GeoTask("x", np.arange(20, dtype=float).reshape(10, 2),
                np.arange(10), 0, "regression")
    a1, b1 = split_task(t)
    a2, b2 = split_task(t)
    np.testing.assert_array_equal(a1.coords, a2.coords)
    assert len(a1.labels) == 8 and len(b1.labels) == 2


def test_cli_end_to_end(tmp_path):
    """save_embeddings then evaluate_npz on the checkerboard with Wrap: the
    full reference workflow (range.py:296-307) through our CLI."""
    from range_tpu.cli import main

    emb_dir = str(tmp_path / "emb")
    rc = main(["--location_model_name", "Wrap", "--task_name", "checker_32",
               "--eval_type", "save_embeddings", "--embeddings_dir", emb_dir,
               "--batch_size", "2048"])
    assert rc == 0
    import os

    dump = np.load(os.path.join(emb_dir, "Wrap", "checker_32_train.npz"))
    assert dump["embeddings"].shape == (10000, 4)
    assert dump["coords"].shape == (10000, 2)
    rc = main(["--location_model_name", "Wrap", "--task_name", "checker_32",
               "--eval_type", "evaluate_npz", "--embeddings_dir", emb_dir])
    assert rc == 0


def test_probe_separates_checkerboard():
    """Encoder-capacity sanity: a spatially expressive encoder beats raw
    coords on the checkerboard probe (the reference's de-facto functional
    test, SURVEY §4)."""
    import jax.numpy as jnp

    import range_tpu
    from range_tpu.api import GeoEncoder
    from range_tpu.eval.embed import encode_task
    from range_tpu.ops.posenc import SphericalHarmonics

    tr, ev, _ = get_dataset("checker_16")
    pe = SphericalHarmonics(legendre_polys=16)
    sh = GeoEncoder("SH16", lambda p, c, e: pe(c), None, pe.embedding_dim)
    acc_sh = evaluate_arrays(encode_task(sh, tr, 2048), tr.labels,
                             encode_task(sh, ev, 2048), ev.labels, "checker_16")
    direct = range_tpu.load_model("Direct")
    acc_dir = evaluate_arrays(encode_task(direct, tr, 2048), tr.labels,
                              encode_task(direct, ev, 2048), ev.labels, "checker_16")
    assert acc_sh > acc_dir
    assert acc_sh > 0.5, acc_sh


def test_coastline_overlay_roundtrip(tmp_path):
    """load_coastlines parses GeoJSON (stdlib-only) and npz polylines into
    the NaN-separated segment format; save_map accepts the overlay."""
    import json

    import numpy as np

    from range_tpu.eval.visualize import load_coastlines, save_map

    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {
            "type": "LineString", "coordinates": [[0, 0], [10, 5], [20, 0]]}},
        {"type": "Feature", "geometry": {
            "type": "MultiPolygon", "coordinates": [
                [[[30, 30], [40, 30], [40, 40], [30, 30]]]]}},
    ]}
    p = tmp_path / "coast.geojson"
    p.write_text(json.dumps(gj))
    c = load_coastlines(str(p))
    assert c.shape[1] == 2 and np.isnan(c[:, 0]).sum() == 2
    assert (c[0] == [0, 0]).all()
    pn = tmp_path / "coast.npz"
    np.savez(pn, segments=c)
    c2 = load_coastlines(str(pn))
    np.testing.assert_array_equal(
        np.nan_to_num(c), np.nan_to_num(c2))
    rgb = np.zeros((18, 36, 3))
    save_map(rgb, str(tmp_path / "m.png"), coastlines=c)
    assert (tmp_path / "m.png").exists()
