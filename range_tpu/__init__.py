"""range_tpu — a TPU-native (JAX/XLA/Pallas) geo-embedding framework.

A from-scratch re-design of the capabilities of mvrl/RANGE
("Retrieval-Augmented Neural Fields for Multi-Resolution Geo-Embeddings",
CVPR 2025): retrieval-augmented location encoders, a zoo of geographic
positional encodings and pretrained location models, bank construction, and
a downstream linear-probe evaluation harness — built TPU-first (SPMD over
`jax.sharding.Mesh`, fused Pallas retrieval kernels, bf16 MXU matmuls)
rather than ported from the reference's single-GPU PyTorch.
"""

__version__ = "0.1.0"

from . import geometry, ops  # noqa: F401

# Lazy-ish convenience re-exports (kept cheap: api pulls in models/bank).
from .api import list_models, load_model  # noqa: F401
