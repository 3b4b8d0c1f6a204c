"""ctypes bindings for the native parallel row gather (_native/gather.cpp).

The streaming input pipeline assembles every shuffled batch on the host with
a row gather from the u8 archive (`StreamingDiskDataset.host_batch`). numpy's
fancy indexing does this on ONE core; the native kernel memcpys rows on a
small std::thread pool, which matters once archives are multi-GiB (a
200k x 256x256 build streams ~3.3 GiB per epoch through this path). The
reference gets the same effect from torch's C++ DataLoader workers
(`/root/reference/scripts/train_vae.py:262-269`).

Build model: no wheels, no pybind11 — the single .cpp is compiled with g++
on first use and cached by source hash (one compile per machine/source
version, ~1 s). Anything missing (no g++, sandboxed tmp, exotic platform)
degrades silently to numpy with identical semantics:

    from toycrystals_tpu.data.native_gather import take_rows
    batch = take_rows(archive, idx)     # == archive[idx], just faster

Set TOYCRYSTALS_NO_NATIVE=1 to force the numpy path (also how the fallback
is tested).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "_native" / "gather.cpp"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _cache_dir() -> Path:
    root = os.environ.get("TOYCRYSTALS_NATIVE_CACHE")
    return Path(root) if root else Path(tempfile.gettempdir()) / "toycrystals_native"


def _load() -> ctypes.CDLL | None:
    """Compile (once, cached by source hash) and load the shared library."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TOYCRYSTALS_NO_NATIVE"):
        return None
    try:
        tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
        cache = _cache_dir()
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"gather_{tag}.so"
        if not so.exists():
            # compile to a unique temp name, then atomically publish — safe
            # against concurrent first-use from several processes
            tmp = so.with_suffix(f".{os.getpid()}.tmp")
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                   "-o", str(tmp), str(_SRC)]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.gather_rows.restype = ctypes.c_int
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — any build/load problem -> numpy
        print(f"native gather unavailable ({type(e).__name__}: {e}); "
              "falling back to numpy", file=sys.stderr)
        _LIB = None
    return _LIB


def native_available() -> bool:
    """True once the compiled kernel is loadable on this machine."""
    return _load() is not None


def take_rows(src: np.ndarray, idx, threads: int = 0) -> np.ndarray:
    """`src[idx]` along axis 0, multi-threaded when the native kernel loads.

    src must be C-contiguous (archives loaded from .npz are); idx is any
    integer array-like. threads=0 auto-sizes (1 thread per ~8 MiB of batch,
    capped at the core count). Raises IndexError on out-of-range indices,
    like numpy.
    """
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.ndim != 1:
        raise ValueError(f"idx must be 1-D, got shape {idx.shape}")
    lib = _load()
    if lib is None or not src.flags.c_contiguous or src.size == 0:
        return src[idx]
    item_bytes = int(np.prod(src.shape[1:], dtype=np.int64)) * src.itemsize
    if item_bytes == 0:
        return src[idx]
    out = np.empty((idx.shape[0], *src.shape[1:]), dtype=src.dtype)
    rc = lib.gather_rows(
        src.ctypes.data, ctypes.c_int64(src.shape[0]),
        idx.ctypes.data, ctypes.c_int64(idx.shape[0]),
        out.ctypes.data, ctypes.c_int64(item_bytes), ctypes.c_int(threads),
    )
    if rc != 0:
        raise IndexError(
            f"index out of range for axis 0 with size {src.shape[0]}")
    return out
