"""ctypes binding + on-demand build for the native NPZ reader (bankio.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bankio.cpp")
_LIB_PATH = os.path.join(_HERE, "_bankio.so")
_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def _get_lib():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.bankio_open.restype = ctypes.c_void_p
        lib.bankio_open.argtypes = [ctypes.c_char_p]
        lib.bankio_close.argtypes = [ctypes.c_void_p]
        lib.bankio_num_members.argtypes = [ctypes.c_void_p]
        lib.bankio_member_name.restype = ctypes.c_char_p
        lib.bankio_member_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.bankio_member_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.bankio_member_nbytes.restype = ctypes.c_longlong
        lib.bankio_member_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.bankio_member_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.c_void_p]
        lib.bankio_member_is_stored.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_npz_native(path: str, names=None, parallel: bool = True,
                    on_member=None) -> Dict[str, np.ndarray]:
    """Load npz members into numpy arrays via the native reader.

    Raises RuntimeError if the native library is unavailable (callers fall
    back to np.load); member loads run on one thread each (the C copy/inflate
    releases the GIL).

    `on_member(name, array)` (optional) is invoked ON THE READER THREAD as
    soon as that member finishes — the pipeline hook that lets a caller
    start an async `jax.device_put` while the OTHER members are still
    inflating, overlapping decompression with device transfers.  Its return
    value (when not None) replaces the array in the result dict."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("bankio native library unavailable")
    h = lib.bankio_open(path.encode())
    if not h:
        raise RuntimeError(f"bankio could not open {path}")
    try:
        if names is None:
            names = []
            for i in range(lib.bankio_num_members(h)):
                n = lib.bankio_member_name(h, i).decode()
                if n.endswith(".npy"):
                    names.append(n[:-4])
        out: Dict[str, np.ndarray] = {}
        metas = {}
        for name in names:
            descr = ctypes.create_string_buffer(32)
            shape = (ctypes.c_longlong * 8)()
            ndim = ctypes.c_int()
            rc = lib.bankio_member_info(h, name.encode(), descr, 32, shape, 8,
                                        ctypes.byref(ndim))
            if rc != 0:
                raise KeyError(f"{name} not in {path}")
            dt = np.dtype(descr.value.decode())
            shp = tuple(shape[i] for i in range(ndim.value))
            metas[name] = (dt, shp)
            out[name] = np.empty(shp, dt)

        def read_one(name):
            arr = out[name]
            rc = lib.bankio_member_read(
                h, name.encode(), arr.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise RuntimeError(f"bankio read failed for {name} (rc={rc})")
            if on_member is not None:
                replaced = on_member(name, arr)
                if replaced is not None:
                    out[name] = replaced

        if parallel and len(names) > 1:
            errors = []

            def read_guarded(name):
                try:
                    read_one(name)
                except Exception as e:  # re-raised on the main thread below
                    errors.append(e)

            threads = [threading.Thread(target=read_guarded, args=(n,))
                       for n in names]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errors:
                raise errors[0]
        else:
            for n in names:
                read_one(n)
        return out
    finally:
        lib.bankio_close(h)
