"""Native runtime pieces (C++, ctypes-bound).

`bankio`: mmap'd NPZ reader for bank artifacts — zero-copy for uncompressed
members, zlib for compressed ones, multithreaded member loads (the copy
releases the GIL inside ctypes).  Built on demand with g++; everything
gracefully falls back to numpy when the toolchain or build is unavailable.
"""

from .bankio import load_npz_native, native_available  # noqa: F401
