"""Import the read-only reference implementation (PyTorch) for parity tests.

The reference package can't be imported wholesale: its positional_encoding
package eagerly imports `spherical_harmonics_ylm`, a sympy-generated file that
was stripped from the snapshot (`.MISSING_LARGE_BLOBS`).  We build a synthetic
package around the reference *files* and stub the missing analytic table with
the closed-form implementation (tests that need analytic semantics compare
against sympy directly instead).

This module lives in tests only — the framework itself never imports the
reference.
"""

import importlib.util
import sys
import types

REF_SATCLIP = "/root/reference/range/location_models/satclip"
REF_PE = REF_SATCLIP + "/positional_encoding"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_pe():
    """Returns the synthetic `refpe` package with the reference PE modules."""
    if "refpe" in sys.modules:
        return sys.modules["refpe"]
    pkg = types.ModuleType("refpe")
    pkg.__path__ = [REF_PE]
    sys.modules["refpe"] = pkg

    common = _load("refpe.common", REF_PE + "/common.py")
    closed = _load("refpe.spherical_harmonics_closed_form",
                   REF_PE + "/spherical_harmonics_closed_form.py")
    # stub the stripped analytic table with the closed-form function so that
    # spherical_harmonics.py imports; analytic parity is tested vs sympy.
    stub = types.ModuleType("refpe.spherical_harmonics_ylm")
    stub.SH = closed.SH
    sys.modules["refpe.spherical_harmonics_ylm"] = stub

    for sub in ["direct", "cartesian3d", "wrap", "theory", "grid_and_sphere",
                "spherical_harmonics"]:
        mod = _load(f"refpe.{sub}", f"{REF_PE}/{sub}.py")
        setattr(pkg, sub, mod)
    # populate the names location_encoder.py expects on `PE`
    pkg.Direct = pkg.direct.Direct
    pkg.Cartesian3D = pkg.cartesian3d.Cartesian3D
    pkg.Wrap = pkg.wrap.Wrap
    pkg.Theory = pkg.theory.Theory
    pkg.GridAndSphere = pkg.grid_and_sphere.GridAndSphere
    pkg.SphericalHarmonics = pkg.spherical_harmonics.SphericalHarmonics
    pkg.DiscretizedSphericalHarmonics = None  # unused in tests
    return pkg


def load_reference_location_encoder():
    """Returns the reference `location_encoder` module (SirenNet, MLP, FCNet,
    factories, LocationEncoder) wired against the synthetic PE package."""
    if "refsatclip.location_encoder" in sys.modules:
        return sys.modules["refsatclip.location_encoder"]
    pe = load_reference_pe()
    pkg = types.ModuleType("refsatclip")
    pkg.__path__ = [REF_SATCLIP]
    pkg.positional_encoding = pe
    sys.modules["refsatclip"] = pkg
    sys.modules["refsatclip.positional_encoding"] = pe
    mod = _load("refsatclip.location_encoder", REF_SATCLIP + "/location_encoder.py")
    return mod


def load_reference_model_old():
    """Returns the reference `model_old` module (Bottleneck, AttentionPool2d,
    ModifiedResNet, CLIP).  timm/torchgeo and the dataset module are stubbed —
    the parity tests only instantiate the ModifiedResNet branch, which needs
    none of them."""
    if "refsatclip.model_old" in sys.modules:
        return sys.modules["refsatclip.model_old"]
    load_reference_location_encoder()  # ensures the refsatclip package exists
    for name in ["timm", "torchgeo"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    tg_models = types.ModuleType("torchgeo.models")
    for w in ["ResNet18_Weights", "ResNet50_Weights", "ViTSmall16_Weights"]:
        setattr(tg_models, w, None)
    sys.modules["torchgeo.models"] = tg_models
    sys.modules["torchgeo"].models = tg_models
    dm = types.ModuleType("refsatclip.datamodules")
    dm.__path__ = []
    s2 = types.ModuleType("refsatclip.datamodules.s2geo_dataset")
    s2.S2Geo = None
    dm.s2geo_dataset = s2
    sys.modules["refsatclip.datamodules"] = dm
    sys.modules["refsatclip.datamodules.s2geo_dataset"] = s2
    sys.modules["refsatclip"].datamodules = dm
    return _load("refsatclip.model_old", REF_SATCLIP + "/model_old.py")
