"""Neural heads vs the reference torch modules: same weights => same outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from range_tpu.convert import satclip_ckpt
from range_tpu.ops import nets

from reference_loader import load_reference_location_encoder

ref_le = load_reference_location_encoder()


def _x(n=32, d=16, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d))


def test_siren_parity():
    torch.manual_seed(0)
    dim_in, hidden, out, layers = 16, 32, 8, 2
    ref = ref_le.SirenNet(dim_in=dim_in, dim_hidden=hidden, dim_out=out,
                          num_layers=layers).double().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = satclip_ckpt.siren_params_from_state_dict(sd, "", jnp.float64)
    ours = nets.SirenNet(dim_in=dim_in, dim_hidden=hidden, dim_out=out, num_layers=layers)
    x = _x(d=dim_in)
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-10)


def test_mlp_parity_tied_weights():
    torch.manual_seed(1)
    ref = ref_le.MLP(input_dim=16, dim_hidden=32, num_layers=2, out_dims=8).double().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = satclip_ckpt.mlp_params_from_state_dict(sd, "", 2, jnp.float64)
    ours = nets.MLP(input_dim=16, dim_hidden=32, num_layers=2, out_dims=8)
    x = _x(seed=1)
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-10)
    # the reference hidden stack is ONE module repeated: both hidden indices
    # resolve to identical tensors (tied weights)
    np.testing.assert_array_equal(sd["features.2.weight"], sd["features.4.weight"])


def test_fcnet_parity():
    torch.manual_seed(2)
    ref = ref_le.FCNet(num_inputs=16, num_classes=8, dim_hidden=32).double().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = satclip_ckpt.fcnet_params_from_state_dict(sd, "", jnp.float64)
    ours = nets.FCNet(num_inputs=16, num_classes=8, dim_hidden=32)
    x = _x(seed=2)
    with torch.no_grad():
        expect = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-10)


def test_siren_init_distribution():
    ours = nets.SirenNet(dim_in=100, dim_hidden=256, dim_out=32, num_layers=2)
    params = ours.init(jax.random.PRNGKey(0))
    w0 = params["layers"][0]["w"]
    assert float(jnp.max(jnp.abs(w0))) <= 1.0 / 100  # first layer: U(-1/dim, 1/dim)
    w1 = params["layers"][1]["w"]
    bound = np.sqrt(6.0 / 256)  # sqrt(c/dim)/w0 with c=6, w0=1
    assert float(jnp.max(jnp.abs(w1))) <= bound


def test_full_location_encoder_parity():
    """posenc+nnet compose vs reference LocationEncoder (closed-form SH)."""
    torch.manual_seed(3)
    L = 10
    ref_pe = ref_le.get_positional_encoding(
        "sphericalharmonics", legendre_polys=L, harmonics_calculation="closed-form"
    ).double()
    ref_net = ref_le.get_neural_network(
        "siren", input_dim=ref_pe.embedding_dim, num_classes=16, dim_hidden=32, num_layers=2
    ).double()
    ref_model = ref_le.LocationEncoder(ref_pe, ref_net).double().eval()

    from range_tpu.models.satclip import SatClipLocationConfig, SatClipLocationEncoder

    cfg = SatClipLocationConfig(
        embed_dim=16, le_type="sphericalharmonics", pe_type="siren",
        legendre_polys=L, harmonics_calculation="closed-form",
        num_hidden_layers=2, capacity=32,
    )
    ours = SatClipLocationEncoder(cfg)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    params = satclip_ckpt.siren_params_from_state_dict(sd, "", jnp.float64)

    rng = np.random.default_rng(3)
    lonlat = np.stack([rng.uniform(-180, 180, 64), rng.uniform(-90, 90, 64)], 1)
    with torch.no_grad():
        expect = ref_model(torch.tensor(lonlat, dtype=torch.float64)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(lonlat, jnp.float64)))
    np.testing.assert_allclose(got, expect, rtol=1e-8, atol=1e-9)


def test_modulated_siren_parity():
    """Modulator + SirenWrapper (location_encoder.py:154-214) vs torch."""
    import torch

    from range_tpu.ops.nets import (apply_modulator, image_grid,
                                    init_modulator, siren_image)
    from reference_loader import load_reference_location_encoder

    ref = load_reference_location_encoder()
    torch.manual_seed(0)
    net_t = ref.SirenNet(dim_in=2, dim_hidden=16, dim_out=3,
                         num_layers=3).double()
    wrapper = ref.SirenWrapper(net_t, image_width=6, image_height=4,
                               latent_dim=8).double().eval()

    # convert both nets through the standard converters
    from range_tpu.convert.satclip_ckpt import siren_params_from_state_dict
    from range_tpu.ops.nets import SirenNet

    sd = {k: v.detach().numpy() for k, v in net_t.state_dict().items()}
    net_j = SirenNet(dim_in=2, dim_hidden=16, dim_out=3, num_layers=3,
                     final_activation="identity")
    params_j = siren_params_from_state_dict(
        {f"model.location.nnet.{k}": v for k, v in sd.items()},
        "model.location.nnet.", jnp.float64)

    mod_params = init_modulator(jax.random.PRNGKey(0), 8, 16, 3,
                                dtype=jnp.float64)
    for i, layer in enumerate(wrapper.modulator.layers):
        mod_params["layers"][i] = {
            "w": jnp.asarray(layer[0].weight.detach().numpy().T),
            "b": jnp.asarray(layer[0].bias.detach().numpy())}

    z = np.random.default_rng(1).standard_normal(8)
    # modulator alone
    ref_mods = wrapper.modulator(torch.from_numpy(z))
    ours_mods = apply_modulator(mod_params, jnp.asarray(z))
    for r, o in zip(ref_mods, ours_mods):
        np.testing.assert_allclose(np.asarray(o), r.detach().numpy(),
                                   rtol=1e-9, atol=1e-9)
    # grid matches the registered buffer
    np.testing.assert_allclose(np.asarray(image_grid(4, 6)),
                               wrapper.grid.numpy(), rtol=1e-6, atol=1e-6)
    # full modulated image forward
    with torch.no_grad():
        ref_img = wrapper(latent=torch.from_numpy(z)).numpy()
    ours_img = np.asarray(siren_image(net_j, params_j, 4, 6,
                                      modulator_params=mod_params,
                                      latent=jnp.asarray(z)))
    # torch/jax linspace differ by ~1e-8 in the grid; w0=30 amplifies it
    np.testing.assert_allclose(ours_img, ref_img, rtol=1e-6, atol=1e-6)
    # exact parity when both nets see the identical grid
    mods_j2 = apply_modulator(mod_params, jnp.asarray(z))
    same_grid = np.asarray(net_j.apply(params_j,
                                       jnp.asarray(wrapper.grid.numpy()),
                                       mods=mods_j2))
    with torch.no_grad():
        ref_same = net_t(wrapper.grid, wrapper.modulator(
            torch.from_numpy(z))).numpy()
    np.testing.assert_allclose(same_grid, ref_same, rtol=1e-9, atol=1e-9)


def test_fused_tower_bf16_matmul_close_to_f32():
    """The serving opt-in `fused_matmul_dtype='bf16'` (bf16 INPUTS on the
    fused SH basis@W0 matmuls, f32 accumulation) must stay within bf16
    rounding of the f32 tower — directionally the embeddings are nearly
    identical (the 1600-term contraction averages the input rounding)."""
    import numpy as np

    from range_tpu.models.satclip import (SatClipLocationConfig,
                                          SatClipLocationEncoder)

    t32 = SatClipLocationEncoder(SatClipLocationConfig(legendre_polys=10))
    tb = SatClipLocationEncoder(SatClipLocationConfig(
        legendre_polys=10, fused_matmul_dtype="bf16"))
    tp = t32.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    coords = jnp.asarray(np.stack([rng.uniform(-180, 180, 256),
                                   rng.uniform(-90, 90, 256)], 1),
                         jnp.float32)
    a = np.asarray(t32.apply(tp, coords))
    b = np.asarray(tb.apply(tp, coords))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    assert (an * bn).sum(1).min() > 0.999
