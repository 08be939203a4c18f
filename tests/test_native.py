"""Native host data pipeline: mmap .npy reader + threaded prefetcher."""

import numpy as np
import pytest

from pigs_tpu.native import NpyFile, RandomRowLoader, get_lib


@pytest.fixture(scope="module")
def npy_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "arr.npy"
    arr = np.arange(37 * 5 * 3, dtype=np.float32).reshape(37, 5, 3)
    np.save(path, arr)
    return str(path), arr


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of libpigs_host.so failed"


def test_npy_file_matches_numpy(npy_path):
    path, arr = npy_path
    f = NpyFile(path)
    assert f.native
    assert f.shape == arr.shape
    assert f.dtype == arr.dtype
    np.testing.assert_array_equal(np.asarray(f.array), arr)
    f.close()


def test_npy_file_f64_and_1d(tmp_path):
    path = str(tmp_path / "b.npy")
    arr = np.linspace(0, 1, 11)
    np.save(path, arr)
    f = NpyFile(path)
    np.testing.assert_array_equal(np.asarray(f.array), arr)
    f.close()


def test_npy_open_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        NpyFile(str(tmp_path / "missing.npy"))


def test_random_row_loader(npy_path):
    path, arr = npy_path
    f = NpyFile(path)
    loader = RandomRowLoader(f, rows_per_batch=4, depth=3, num_threads=2,
                             seed=7)
    assert loader.native
    seen = set()
    for _ in range(20):
        batch, idx = loader.next()
        assert batch.shape == (4, 5, 3)
        np.testing.assert_array_equal(batch, arr[idx])
        seen.update(idx.tolist())
        loader.release()
    assert len(seen) > 10  # random coverage across rows
    loader.close()
    f.close()
