"""Torch-free reader for PyTorch checkpoint files.

The runtime image must not need torch to *serve* models, but the artifacts of
the reference ecosystem (SatCLIP `.ckpt` from Lightning — `satclip/load.py:4`,
CSP `.pth.tar` — `csp/load_csp.py:10`, TaxaBind `.pt` — `range/range.py:136`)
are all `torch.save` products.  Since torch >= 1.6 that format is a zip
archive holding `<name>/data.pkl` (a pickle of the object graph, with tensors
as persistent-id references) plus one raw little-endian buffer per storage at
`<name>/data/<key>`.  This module unpickles that graph with numpy-backed
tensor shims — no torch import.

If the file predates the zip format (legacy serialization), we fall back to
`torch.load` when torch is importable, else raise.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any

import numpy as np

try:  # bfloat16 support without torch
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16

# torch.save can also encode dtype through `UntypedStorage` + a dtype in the
# rebuild args; handled in _rebuild_tensor_v2 via storage.dtype being None.


class _StorageType:
    """Stands in for torch.FloatStorage & friends during unpickling."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)

    def __repr__(self):  # pragma: no cover
        return f"_StorageType({self.name})"


class _LazyStorage:
    """A storage reference resolved against the zip archive on demand."""

    def __init__(self, archive: "TorchZipReader", key: str, dtype, numel: int):
        self.archive = archive
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self._data = None

    def data(self) -> np.ndarray:
        if self._data is None:
            raw = self.archive.read_record(f"data/{self.key}")
            if self.dtype is None:
                raise ValueError(f"storage {self.key} has unknown dtype")
            self._data = np.frombuffer(raw, dtype=self.dtype)
        return self._data


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    flat = storage.data()
    size = tuple(size)
    stride = tuple(stride)
    if len(size) == 0:
        return flat[storage_offset].copy()
    itemsize = flat.dtype.itemsize
    needed = storage_offset + (
        sum((s - 1) * st for s, st in zip(size, stride)) + 1 if all(size) else 0
    )
    base = flat[storage_offset:needed] if needed else flat[storage_offset:storage_offset]
    if not all(size):
        return np.empty(size, dtype=flat.dtype)
    arr = np.lib.stride_tricks.as_strided(
        base, shape=size, strides=tuple(st * itemsize for st in stride)
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    result = func(*args)
    if state:
        if isinstance(state, dict):
            pass  # plain tensors carry no state we need
    return result


class _Opaque:
    """Absorbs unknown classes (e.g. stray Lightning objects) without failing."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __setstate__(self, state):
        self.state = state

    def __call__(self, *a, **k):  # pragma: no cover
        return _Opaque()


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, archive: "TorchZipReader"):
        super().__init__(file, encoding="latin1")
        self.archive = archive

    def find_class(self, module: str, name: str):
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch._tensor" and name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        if module == "torch" and name in ("Tensor", "FloatTensor", "DoubleTensor"):
            return _Opaque
        if module == "torch.serialization" and name == "_get_layout":  # pragma: no cover
            return lambda *a: None
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "argparse" and name == "Namespace":
            import argparse

            return argparse.Namespace
        if module == "numpy.core.multiarray" and name == "_reconstruct":
            from numpy.core.multiarray import _reconstruct  # type: ignore

            return _reconstruct
        if module == "numpy" and name in ("ndarray", "dtype"):
            return getattr(np, name)
        if module.startswith(("builtins", "copyreg", "__builtin__")):
            return super().find_class(module, name)
        try:
            return super().find_class(module, name)
        except Exception:
            return _Opaque

    def persistent_load(self, pid):
        # pid = ('storage', StorageType, key, location, numel)
        if isinstance(pid, tuple) and pid and pid[0] == "storage":
            _, storage_type, key, _location, numel = pid
            dtype = getattr(storage_type, "dtype", None)
            return _LazyStorage(self.archive, str(key), dtype, numel)
        raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")


class TorchZipReader:
    """Reads one torch zip checkpoint."""

    def __init__(self, path: str):
        self.zf = zipfile.ZipFile(path)
        names = self.zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(f"{path}: not a torch zip checkpoint (no data.pkl)")
        self.prefix = pkl[0][: -len("data.pkl")]

    def read_record(self, name: str) -> bytes:
        return self.zf.read(self.prefix + name)

    def load(self) -> Any:
        data = io.BytesIO(self.read_record("data.pkl"))
        return _TorchUnpickler(data, self).load()


def load_torch_checkpoint(path: str) -> Any:
    """Load a torch checkpoint into plain python + numpy, torch-free when the
    file is zip-format; falls back to `torch.load` for legacy files."""
    try:
        return TorchZipReader(path).load()
    except (zipfile.BadZipFile, ValueError):
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise ValueError(
                f"{path} is a legacy torch file and torch is unavailable"
            ) from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
        return _torch_to_numpy(obj)


def _torch_to_numpy(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy(v) for v in obj)
    return obj
