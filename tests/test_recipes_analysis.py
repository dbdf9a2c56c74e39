"""CSP recipes, encode_loc_time parity, balanced sampling, analysis metrics,
sphere2vec hparams access, orbax checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from range_tpu.eval.analysis import embedding_cluster_map, mrr, mrr_by_latitude
from range_tpu.train import csp_recipes as cr


def test_encode_loc_time_parity():
    """vs the reference implementation imported from the snapshot."""
    import importlib.util, sys, types

    base = "/root/reference/range/location_models/csp/main"
    if "refcsp_utils_elt" not in sys.modules:
        # utils.py has heavy imports; execute only through models-needed path —
        # instead transcribe the call through the already-tested refcsp loader
        sys.path.insert(0, "tests")
    from test_zoo import _load_ref_csp  # reuses the module shims

    _load_ref_csp()
    # reference utils.py imports torch Sampler etc. — import it now
    spec = importlib.util.spec_from_file_location("refcsp.utils", f"{base}/utils.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refcsp.utils"] = mod
    sys.modules["utils"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"reference utils not importable here: {e}")

    rng = np.random.default_rng(0)
    loc = rng.uniform(-1, 1, (16, 2))
    date = rng.uniform(-1, 1, 16)
    for loc_enc in ["encode_cos_sin", "encode_3D", "encode_none"]:
        for use_date in [False, True]:
            params = {"loc_encode": loc_enc, "date_encode": "encode_cos_sin",
                      "use_date_feats": use_date}
            ref = mod.encode_loc_time(torch.tensor(loc), torch.tensor(date),
                                      concat_dim=1, params=params).numpy()
            got = np.asarray(cr.encode_loc_time(
                jnp.asarray(loc), jnp.asarray(date), loc_encode=loc_enc,
                use_date_feats=use_date))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7,
                                       err_msg=f"{loc_enc} date={use_date}")


def test_balanced_indices():
    classes = np.array([0] * 100 + [1] * 5 + [2] * 50)
    idx = cr.balanced_indices(classes, num_per_class=10, seed=0)
    picked = classes[idx]
    assert (picked == 0).sum() == 10
    assert (picked == 1).sum() == 5  # fewer than cap without replacement
    assert (picked == 2).sum() == 10
    idx_r = cr.balanced_indices(classes, num_per_class=10, use_replace=True)
    assert len(idx_r) == 30


def test_recipes_and_run_name():
    r = cr.RECIPES["fmow-contsoftmax"]
    assert r.model.spa_enc_type == "gridcell"
    name = cr.make_run_name(r)
    assert name.startswith("model_fmow_gridcell_")
    assert "UNSUPER-contsoftmax" in name
    # recipe is trainable end-to-end (1 step)
    import optax

    from range_tpu.models.csp import CspLocationEncoder
    from range_tpu.train.csp import CspTrainer, make_train_step

    small = cr.CspRecipe(
        name="fmow-contsoftmax",
        model=cr.CspConfig(spa_enc_type="gridcell", num_filts=32, num_classes=5,
                           frequency_num=8, hidden_dim=64, use_layn=True,
                           skip_connection=True),
        train=cr.CspTrainConfig(unsuper_loss="contsoftmax", cnn_feat_dim=32),
        lr=1e-3, weight_decay=1e-3)
    tr = CspTrainer(CspLocationEncoder(small.model), small.train)
    params = tr.init(jax.random.PRNGKey(0))
    opt = optax.adamw(small.lr, weight_decay=small.weight_decay)
    step = make_train_step(tr, opt)
    rng = np.random.default_rng(0)
    batch = {"loc_feat": jnp.asarray(rng.uniform(-90, 90, (8, 2)), jnp.float32),
             "cnn_features": jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)}
    _, _, loss = step(params, opt.init(params), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_mrr_metrics():
    pred = np.eye(5)[np.array([0, 1, 2, 3, 4])]
    classes = np.array([0, 1, 2, 3, 4])
    assert mrr(pred, classes) == 1.0
    lats = np.array([-80, -30, 0, 30, 80])
    bands = mrr_by_latitude(pred, classes, lats, n_bands=3)
    assert all(v == 1.0 for v in bands.values())


def test_embedding_cluster_map():
    import range_tpu

    enc = range_tpu.load_model("Cartesian_3D")
    m = embedding_cluster_map(enc, n_clusters=4, step=15.0)
    assert m.shape == (12, 24)
    assert 2 <= len(np.unique(m)) <= 4


def test_sphere2vec_hparams():
    from range_tpu.api import sphere2vec_hparams

    hp = sphere2vec_hparams("inat2018", "spherec", "linear")
    assert hp["frequency_num"] == 48
    with pytest.raises(KeyError):
        sphere2vec_hparams("landoceandataset", "grid", "mlp")
    # yaml path mode against the reference database itself
    hp2 = sphere2vec_hparams("inat2018", "spherec", "linear",
                             yaml_path="/root/reference/range/location_models/"
                                       "sphere2vec/hparams.yaml")
    assert hp2["frequency_num"] == 48


def test_orbax_checkpoint_roundtrip(tmp_path):
    from range_tpu.utils.checkpoint import load_orbax, save_orbax

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    save_orbax(path, state)
    restored = load_orbax(path)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
    assert int(restored["step"]) == 7
