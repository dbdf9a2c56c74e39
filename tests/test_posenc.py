"""Positional encodings vs the reference torch implementations (float64)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from range_tpu.ops import posenc

from reference_loader import load_reference_pe

refpe = load_reference_pe()


def _rand_lonlat(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], 1
    )


def _compare(ours, ref_mod, lonlat, rtol=1e-9, atol=1e-9):
    ref = ref_mod(torch.tensor(lonlat, dtype=torch.float64)).numpy()
    got = np.asarray(ours(jnp.asarray(lonlat, jnp.float64)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)
    assert ours.embedding_dim == ref.shape[1]


def test_direct():
    _compare(posenc.Direct(), refpe.Direct(), _rand_lonlat())


def test_cartesian3d():
    _compare(posenc.Cartesian3D(), refpe.Cartesian3D(), _rand_lonlat(seed=1))


def test_wrap():
    _compare(posenc.Wrap(), refpe.Wrap(), _rand_lonlat(seed=2))


def test_theory():
    _compare(
        posenc.Theory(frequency_num=32, min_radius=1.0),
        refpe.Theory(frequency_num=32, min_radius=1),
        _rand_lonlat(seed=3),
    )


@pytest.mark.parametrize("name", ["grid", "spherec", "spherecplus", "spherem", "spheremplus"])
def test_grid_and_sphere(name):
    kw = dict(frequency_num=8, max_radius=360.0, min_radius=1.0)
    _compare(
        posenc.GridAndSphere(name=name, **kw),
        refpe.GridAndSphere(name=name, frequency_num=8, max_radius=360, min_radius=1),
        _rand_lonlat(seed=4),
    )


def test_factory_dims():
    for name, dim in [("direct", 2), ("cartesian3d", 3), ("wrap", 4)]:
        assert posenc.get_positional_encoding(name).embedding_dim == dim
    assert posenc.get_positional_encoding(
        "sphericalharmonics", legendre_polys=10
    ).embedding_dim == 100
    assert posenc.get_positional_encoding("theory", frequency_num=16).embedding_dim == 96
