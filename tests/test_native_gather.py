"""Native C++ gather core: build, parity with numpy, loader integration."""
import numpy as np
import pytest

from mmearth_tpu.data import native


def test_build_and_parity():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1000, 17, 5)).astype(np.float32)
    rows = rng.integers(0, 1000, size=64)
    out = native.gather_rows(src, rows)
    np.testing.assert_array_equal(out, src[rows])

    # int dtype + memmap source
    import tempfile, pathlib

    d = pathlib.Path(tempfile.mkdtemp())
    mm = np.lib.format.open_memmap(d / "x.bin", mode="w+", dtype=np.int32, shape=(500, 33))
    mm[:] = rng.integers(0, 100, size=(500, 33))
    mm.flush()
    ro = np.lib.format.open_memmap(d / "x.bin", mode="r")
    rows = rng.integers(0, 500, size=128)
    np.testing.assert_array_equal(native.gather_rows(ro, rows), np.asarray(ro)[rows])
    native.prefetch_rows(ro, rows)  # smoke: must not crash


def test_numpy_fallback(monkeypatch):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    rng = np.random.default_rng(1)
    src = rng.normal(size=(100, 7)).astype(np.float32)
    rows = rng.integers(0, 100, size=16)
    np.testing.assert_array_equal(native.gather_rows(src, rows), src[rows])
