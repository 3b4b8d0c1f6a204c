"""Native parallel row gather (data/_native/gather.cpp via ctypes).

Correctness contract: `take_rows(src, idx) == src[idx]` bitwise for any
C-contiguous src, any dtype, with numpy-style IndexError on out-of-range
indices — plus a silent numpy fallback when the toolchain is missing
(TOYCRYSTALS_NO_NATIVE=1 forces it)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from toycrystals_tpu.data.native_gather import native_available, take_rows

rng = np.random.default_rng(7)


@pytest.mark.parametrize("shape,dtype", [
    ((100, 7), np.uint8),
    ((50, 16, 16, 1), np.uint8),     # the archive layout
    ((33, 5, 3), np.float32),
    ((10,), np.int64),               # 1-D rows (scalars)
])
def test_matches_numpy(shape, dtype):
    src = rng.integers(0, 200, size=shape).astype(dtype)
    idx = rng.integers(0, shape[0], size=77)
    np.testing.assert_array_equal(take_rows(src, idx), src[idx])


def test_thread_counts_and_empty():
    src = rng.integers(0, 255, size=(64, 32, 32, 1)).astype(np.uint8)
    idx = rng.integers(0, 64, size=256)
    want = src[idx]
    for threads in (0, 1, 3, 16, 1000):  # incl. more threads than rows
        np.testing.assert_array_equal(take_rows(src, idx, threads=threads), want)
    out = take_rows(src, np.zeros((0,), np.int64))
    assert out.shape == (0, 32, 32, 1) and out.dtype == np.uint8


def test_out_of_range_raises_like_numpy():
    src = np.zeros((4, 2), np.uint8)
    with pytest.raises(IndexError):
        take_rows(src, [0, 4])
    with pytest.raises(IndexError):
        take_rows(src, [-1])
    with pytest.raises(ValueError, match="1-D"):
        take_rows(src, np.zeros((2, 2), np.int64))


def test_non_contiguous_falls_back():
    base = rng.integers(0, 255, size=(40, 8, 9), dtype=np.uint8)
    src = base[:, ::2]  # not C-contiguous -> numpy path, same result
    assert not src.flags.c_contiguous
    idx = rng.integers(0, 40, size=11)
    np.testing.assert_array_equal(take_rows(src, idx), src[idx])


def test_forced_fallback_and_streaming_dataset(tmp_path, monkeypatch):
    """TOYCRYSTALS_NO_NATIVE=1 must produce identical batches; the streaming
    dataset's host_batch goes through take_rows either way."""
    code = r"""
import numpy as np
from toycrystals_tpu.data.native_gather import native_available, take_rows
assert not native_available()
src = np.arange(5 * 6, dtype=np.uint8).reshape(5, 6)
out = take_rows(src, [4, 0, 2])
np.testing.assert_array_equal(out, src[[4, 0, 2]])
print("fallback-ok")
"""
    env = {"TOYCRYSTALS_NO_NATIVE": "1", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": str(Path(__file__).resolve().parent.parent)}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "fallback-ok" in r.stdout, r.stderr

    from toycrystals_tpu.data.stream import StreamingDiskDataset

    x = rng.integers(0, 255, size=(24, 8, 8, 1)).astype(np.uint8)
    y_cat = rng.integers(0, 4, size=24).astype(np.int64)
    y_cont = rng.normal(size=(24, 4)).astype(np.float32)
    p = tmp_path / "arch.npz"
    np.savez(p, x_u8=x, y_cat=y_cat, y_cont=y_cont)
    ds = StreamingDiskDataset(p)
    xb, cb, vb = ds.host_batch([3, 3, 0, 17])
    np.testing.assert_array_equal(xb, x[[3, 3, 0, 17]])
    np.testing.assert_array_equal(cb, y_cat[[3, 3, 0, 17]].astype(np.int32))
    np.testing.assert_array_equal(vb, y_cont[[3, 3, 0, 17]])


def test_native_builds_here():
    """The toolchain is part of this repo's environment contract (CLAUDE.md);
    if the kernel stopped building we want a failure, not a silent numpy
    fallback forever."""
    assert native_available()
