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


def test_npy_fortran_order_falls_back_to_numpy(tmp_path):
    """The native reader rejects fortran_order headers; NpyFile must fall
    back to np.load (correct values, no silent transpose)."""
    path = str(tmp_path / "f.npy")
    arr = np.arange(12.0).reshape(3, 4)
    np.save(path, np.asfortranarray(arr))
    f = NpyFile(path)
    assert not f.native
    np.testing.assert_array_equal(np.asarray(f.array), arr)
    f.close()


def test_loader_batches_are_owned_copies(npy_path):
    """next() returns owned copies and recycles the ring slot itself: holding
    many batches without release() must neither deadlock (old slot leak) nor
    corrupt earlier batches (ring-slot aliasing)."""
    path, arr = npy_path
    f = NpyFile(path)
    loader = RandomRowLoader(f, rows_per_batch=4, depth=2, num_threads=2,
                             seed=3)
    batches = [loader.next() for _ in range(10)]  # 5x the ring depth
    for batch, idx in batches:
        np.testing.assert_array_equal(batch, arr[idx])
    loader.close()
    f.close()


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
