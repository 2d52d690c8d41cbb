"""Native npz reader: build, parity with np.load, speed sanity."""

import time

import numpy as np
import pytest

from pydreamer_tpu.native import load_npz, native_available


@pytest.fixture(scope="module")
def sample_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("npz") / "sample.npz"
    rng = np.random.RandomState(0)
    data = {
        "image_t": rng.randint(0, 255, (64, 64, 3, 500), dtype=np.uint8),
        "action": rng.rand(500, 6).astype(np.float32),
        "reward": rng.randn(500).astype(np.float64),
        "reset": np.zeros(500, bool),
        "small_int": np.arange(7, dtype=np.int64),
        "scalarish": np.array(3.5),
    }
    np.savez_compressed(path, **data)
    return path, data


def test_native_builds():
    assert native_available(), "native npz reader failed to build"


def test_parity_with_np_load(sample_npz):
    path, data = sample_npz
    got = load_npz(path)
    assert set(got) == set(data)
    for k in data:
        assert got[k].dtype == data[k].dtype, k
        np.testing.assert_array_equal(got[k], data[k], err_msg=k)


def test_uncompressed_npz(sample_npz, tmp_path):
    """'stored' entries (np.savez without compression) must also work."""
    path = tmp_path / "raw.npz"
    np.savez(path, x=np.arange(100, dtype=np.float32).reshape(10, 10))
    got = load_npz(path)
    np.testing.assert_array_equal(got["x"], np.arange(100, dtype=np.float32).reshape(10, 10))


def test_speed_not_pathological(sample_npz):
    """Native reader should not be slower than np.load by more than 2x."""
    path, _ = sample_npz
    load_npz(path)  # warm the lib + page cache
    t0 = time.perf_counter()
    for _ in range(3):
        load_npz(path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        with np.load(path) as npz:
            {k: npz[k] for k in npz.files}
    t_np = time.perf_counter() - t0
    assert t_native < t_np * 2.0, (t_native, t_np)
