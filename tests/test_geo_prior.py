"""Geo-prior eval, grid predictor, visualizer, iNat pipeline (synthetic data)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from range_tpu.eval import geo_prior as gp
from range_tpu.eval.grid_predictor import GridPredictor
from range_tpu.eval.visualize import coord_grid, embedding_rgb_map, histogram_equalize


def _toy_data(n=500, k=6, seed=0):
    """Classes arranged in longitude bands — spatial priors should help."""
    rng = np.random.default_rng(seed)
    classes = rng.integers(0, k, n)
    lons = (classes * 60 - 150) + rng.normal(0, 5, n)  # band centers
    lats = rng.uniform(-60, 60, n)
    return np.stack([lons, lats], 1), classes


def test_neighbor_prior_helps():
    train_locs, train_cls = _toy_data(seed=0)
    val_locs, val_cls = _toy_data(200, seed=1)
    k = 6
    rng = np.random.default_rng(2)
    noisy_preds = jax.nn.softmax(jnp.asarray(
        0.5 * np.eye(k)[val_cls] + rng.normal(0, 0.3, (200, k))), axis=-1)
    base = gp.compute_topk_acc(np.asarray(noisy_preds), val_cls)[1]
    prior = gp.neighbor_prior(jnp.asarray(train_cls), k, jnp.asarray(val_locs),
                              jnp.asarray(train_locs), ptype="distance",
                              dist_thresh=0.2)
    combined = gp.compute_topk_acc(np.asarray(gp.combine(noisy_preds, prior)),
                                   val_cls)[1]
    assert combined > base
    # knn variant also valid probabilities
    pk = np.asarray(gp.neighbor_prior(jnp.asarray(train_cls), k,
                                      jnp.asarray(val_locs), jnp.asarray(train_locs),
                                      ptype="knn", num_neighbors=20))
    np.testing.assert_allclose(pk.sum(1), 1.0, rtol=1e-5)


def test_grid_prior():
    train_locs, train_cls = _toy_data(seed=3)
    prior = gp.GridPrior(train_locs, train_cls, 6, gp_size=(36, 18))
    out = prior.eval(np.array([[-150.0, 0.0], [np.nan, 0.0]]))
    assert out.shape == (2, 6)
    np.testing.assert_allclose(out[1], 1 / 6, rtol=1e-6)  # nan -> uniform
    assert out[0].argmax() == 0  # band center of class 0


def test_kde_prior_valid_probs():
    train_locs, train_cls = _toy_data(seed=4)
    val_locs, _ = _toy_data(50, seed=5)
    prior = np.asarray(gp.kde_prior(jnp.asarray(train_cls), jnp.asarray(train_locs),
                                    6, jnp.asarray(val_locs), kde_nb=20))
    assert np.all(np.isfinite(prior)) and np.all(prior >= 0)
    np.testing.assert_allclose(prior.sum(1), 1.0, rtol=1e-4)


def test_train_freq_and_ranks():
    _, cls = _toy_data(seed=6)
    freq = gp.train_freq_prior(cls, 6)
    np.testing.assert_allclose(freq.sum(), 1.0)
    pred = np.eye(6)[cls[:20]]
    ranks = gp.label_ranks(pred, cls[:20])
    assert np.all(ranks == 1)


def test_grid_predictor():
    import range_tpu

    enc = range_tpu.load_model("Wrap")
    pred = GridPredictor(shape=(18, 36)).dense_prediction(
        lambda p, c: enc.apply(p, c), enc.params, batch_size=256)
    assert pred.shape == (18, 36, 4)
    assert np.all(np.isfinite(pred))
    # mask application
    mask = np.zeros((18, 36))
    mask[0, 0] = 1
    p2 = GridPredictor(shape=(18, 36), mask=mask).dense_prediction(
        lambda p, c: enc.apply(p, c), enc.params, batch_size=256)
    assert np.all(p2[1:] == 0)


def test_embedding_rgb_map():
    import range_tpu

    enc = range_tpu.load_model("s2vec_grid")
    rgb = embedding_rgb_map(enc, extent=(-180, 180, -90, 90), step=10.0,
                            batch_size=512)
    assert rgb.shape == (18, 36, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    he = histogram_equalize(np.random.default_rng(0).standard_normal((5, 5, 3)))
    assert he.min() == 0 and he.max() == 1


def test_inat_pipeline(tmp_path):
    from range_tpu.data import inat

    # synthetic geo_prior-style files
    n = 30
    rng = np.random.default_rng(0)
    loc_data = [
        {"id": i, "lon": float(rng.uniform(-180, 180)),
         "lat": float(rng.uniform(-90, 90)), "date_c": 0.5,
         "user_id": int(rng.integers(0, 5))}
        for i in range(n)
    ]
    loc_data[3]["lon"] = None  # one invalid row
    ann = {
        "images": [{"id": i} for i in range(n)],
        "annotations": [{"image_id": i, "category_id": int(rng.integers(0, 8))}
                        for i in range(n)],
    }
    d = str(tmp_path)
    for split in ["train", "val"]:
        with open(os.path.join(d, f"{split}2018_locations.json"), "w") as f:
            json.dump(loc_data, f)
        with open(os.path.join(d, f"{split}2018.json"), "w") as f:
            json.dump(ann, f)

    splits = inat.load_dataset(d, "2018", "val", remove_invalid=True)
    assert splits["train"].locs.shape == (n - 1, 2)  # invalid row dropped
    bs = list(inat.batches(splits["train"], 10))
    assert len(bs) == 3 and bs[0]["loc_feat"].shape == (10, 2)

    paths = inat.export_csvs(splits, os.path.join(d, "out"))
    import pandas as pd

    df = pd.read_csv(paths["val"])
    assert list(df.columns) == ["lon", "lat", "class"]

    # sparse preds round-trip
    from scipy import sparse

    preds = sparse.csr_matrix(np.abs(rng.standard_normal((5, 8))))
    sp_path = os.path.join(d, "preds.npz")
    sparse.save_npz(sp_path, preds)
    dense = inat.load_sparse_feats(sp_path)
    np.testing.assert_allclose(dense, preds.todense(), rtol=1e-6)


def test_compute_acc_dispatch():
    """The prior-type dispatch wrapper (compute_acc parity surface)."""
    train_locs, train_cls = _toy_data(seed=9)
    val_locs, val_cls = _toy_data(100, seed=10)
    k = 6
    rng = np.random.default_rng(11)
    preds = np.asarray(jax.nn.softmax(jnp.asarray(
        0.5 * np.eye(k)[val_cls] + rng.normal(0, 0.3, (100, k))), axis=-1))
    base = gp.compute_acc(preds, val_cls, prior_type="no_prior")
    assert set(base) == {1, 3, 5, 10}
    nn = gp.compute_acc(preds, val_cls, val_locs=val_locs,
                        train_classes=train_cls, train_locs=train_locs,
                        prior_type="nn_dist",
                        hyper_params={"dist_thresh": 0.2})
    assert nn[1] >= base[1]
    tf = gp.compute_acc(preds, val_cls, train_classes=train_cls,
                        prior_type="train_freq")
    assert 0 <= tf[1] <= 1
    grid = gp.GridPrior(train_locs, train_cls, k, gp_size=(36, 18))
    gr = gp.compute_acc(preds, val_cls, val_locs=val_locs, prior_type="grid",
                        prior=grid)
    assert 0 <= gr[1] <= 1
    kde = gp.compute_acc(preds, val_cls, val_locs=val_locs,
                         train_classes=train_cls, train_locs=train_locs,
                         prior_type="kde", hyper_params={"kde_nb": 20})
    assert 0 <= kde[1] <= 1
    # prior-only (val_preds=None) requires a prior
    only = gp.compute_acc(None, val_cls, val_locs=val_locs,
                          train_classes=train_cls, train_locs=train_locs,
                          prior_type="nn_dist", num_classes=k,
                          hyper_params={"dist_thresh": 0.2})
    assert only[1] > 1.0 / k


def test_csp_dataset_dispatch(tmp_path):
    """fmow/yfcc/birdsnap branches of the CSP dataset dispatch."""
    from range_tpu.data import inat
    import pandas as pd

    d = str(tmp_path)
    rng = np.random.default_rng(0)

    # --- fmow: paired location/annotation json, dense moco preds
    n = 20
    for split in ["train", "val"]:
        loc = [{"id": i, "lon": float(rng.uniform(-180, 180)),
                "lat": float(rng.uniform(-90, 90)), "date_c": 0.1,
                "user_id": 0} for i in range(n)]
        ann = {"images": [{"id": i} for i in range(n)],
               "annotations": [{"image_id": i,
                                "category_id": int(rng.integers(0, 62))}
                               for i in range(n)]}
        with open(os.path.join(d, f"{split}_location.json"), "w") as f:
            json.dump(loc, f)
        with open(os.path.join(d, f"{split}.json"), "w") as f:
            json.dump(ann, f)
    os.makedirs(os.path.join(d, "feature_moco"), exist_ok=True)
    np.save(os.path.join(d, "feature_moco", "fmow_val_preds.npy"),
            rng.random((n, 62), np.float32))
    splits = inat.load_csp_dataset("fmow", d, load_cnn_predictions=True)
    assert splits["train"].locs.shape == (n, 2)
    assert splits["val"].preds.shape == (n, 62)
    with pytest.raises(ValueError):
        inat.load_csp_dataset("fmow", d, eval_split="test")

    # --- yfcc: single csv with split column, users -1, dates 0
    df = pd.DataFrame({
        "split": ["train"] * 15 + ["val"] * 5,
        "lon": rng.uniform(-180, 180, 20),
        "lat": rng.uniform(-90, 90, 20),
        "class": rng.integers(0, 100, 20),
    })
    df.to_csv(os.path.join(d, "train_test_split.csv"), index=False)
    y = inat.load_csp_dataset("yfcc", d)
    assert y["train"].locs.shape == (15, 2) and y["val"].locs.shape == (5, 2)
    assert np.all(y["train"].users == -1) and np.all(y["val"].dates == 0)

    # --- birdsnap: split-keyed json with per-entry metadata
    entries = {}
    for split in ["train", "val"]:
        entries[split] = [
            {"valid_image": True, "class_id": int(rng.integers(0, 500)),
             "orig_meta": {"user_id": 1, "lon": 0.0, "lat": 1.0, "date": 0.5}}
            for _ in range(8)]
    with open(os.path.join(d, "birdsnap_with_loc_2019.json"), "w") as f:
        json.dump(entries, f)
    b = inat.load_csp_dataset("birdsnap", d)
    assert b["val"].locs.shape == (8, 2)

    with pytest.raises(ValueError):
        inat.load_csp_dataset("mystery", d)


def test_geo_net_and_tang_priors():
    """'geo_net' (model prior, nan rows dropped) and 'tang_et_al'
    (eval_helper.py:104-140) branches of compute_acc."""
    train_locs, train_cls = _toy_data(seed=20)
    val_locs, val_cls = _toy_data(100, seed=21)
    k = 6
    rng = np.random.default_rng(22)
    preds = np.asarray(jax.nn.softmax(jnp.asarray(
        0.5 * np.eye(k)[val_cls] + rng.normal(0, 0.3, (100, k))), axis=-1))
    val_locs = val_locs.copy()
    val_locs[0] = np.nan  # unlocated sample must be dropped, not crash

    # geo_net prior: an oracle location model — should improve top-1
    def loc_model(locs):
        band = np.clip(((locs[:, 0] + 150) / 60).round().astype(int), 0, k - 1)
        return 0.2 / k + 0.8 * np.eye(k)[band]

    base = gp.compute_acc(preds, val_cls, val_locs=val_locs,
                          prior_type="no_prior")
    net = gp.compute_acc(preds, val_cls, val_locs=val_locs,
                         prior_type="geo_net", prior=loc_model)
    assert net[1] >= base[1]

    # tang_et_al: prior IS the prediction (log-probs), feats routed through
    from range_tpu.models.csp import apply_tangnet, init_tangnet
    import jax as _jax

    params = init_tangnet(_jax.random.PRNGKey(0), 12, 8, 4, k)
    feats = rng.standard_normal((100, 8)).astype(np.float32)

    def tang(locs, f):
        grid = np.clip(((locs[:, 0] + 180) / 30).astype(int), 0, 11)
        onehot = np.eye(12, dtype=np.float32)[grid]
        return np.asarray(apply_tangnet(params, jnp.asarray(onehot),
                                        jnp.asarray(f)))

    tg = gp.compute_acc(preds, val_cls, val_locs=val_locs,
                        prior_type="tang_et_al", prior=tang, val_feats=feats,
                        num_classes=k)
    assert 0.0 <= tg[1] <= 1.0


def test_cross_val_hyper_params():
    hp = gp.cross_val_hyper_params("inat_2018")
    assert hp["num_neighbors"] == 1500 and hp["gp_size"] == (180, 60)
    assert gp.cross_val_hyper_params("birdsnap", "ebird_meta")["kde_nb"] == 500
    assert gp.cross_val_hyper_params("yfcc")["dist_type"] == "haversine"
    with pytest.raises(KeyError):
        gp.cross_val_hyper_params("fmow")
    # the table plugs straight into compute_acc
    train_locs, train_cls = _toy_data(seed=30)
    val_locs, val_cls = _toy_data(50, seed=31)
    acc = gp.compute_acc(None, val_cls, val_locs=val_locs,
                         train_classes=train_cls, train_locs=train_locs,
                         prior_type="kde", num_classes=6,
                         hyper_params={"kde_nb": 20})
    assert 0 <= acc[1] <= 1


def test_plot_gt_locations(tmp_path):
    from range_tpu.eval.visualize import plot_gt_locations

    locs, cls = _toy_data(seed=40)
    out = os.path.join(str(tmp_path), "gt_0000.jpg")
    n = plot_gt_locations(locs, cls, class_of_interest=0, out_path=out,
                          train_dates=np.random.default_rng(0).random(len(cls)),
                          mask=np.zeros((18, 36)))
    assert n == int((cls == 0).sum())
    assert os.path.getsize(out) > 0
