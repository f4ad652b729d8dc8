"""Native C++ fastloader tests: build, correctness vs numpy, fallback."""

import numpy as np
import pytest

from imagecaptioning_tpu.native import (ensure_built, gather_images_cropped,
                                        gather_records, is_available)


def test_builds_with_toolchain():
    # g++ is baked into the image; the library must compile and load.
    assert ensure_built(verbose=True) is not None
    assert is_available()


def test_gather_records_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (20, 13, 7, 3), np.uint8)
    idx = rng.randint(0, 20, size=9)
    got = gather_records(src, idx, num_threads=4)
    np.testing.assert_array_equal(got, src[idx])


def test_gather_records_single_thread_and_out_buffer():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 256, (5, 4, 4, 3), np.uint8)
    idx = np.array([4, 0, 2])
    out = np.empty((3, 4, 4, 3), np.uint8)
    got = gather_records(src, idx, out=out, num_threads=1)
    assert got is out
    np.testing.assert_array_equal(out, src[idx])


def test_gather_records_bad_index():
    src = np.zeros((3, 2, 2, 3), np.uint8)
    if is_available():
        with pytest.raises(ValueError):
            gather_records(src, np.array([5]))


def test_gather_records_non_u8_falls_back():
    rng = np.random.RandomState(2)
    src = rng.rand(6, 3, 3).astype(np.float32)
    idx = np.array([1, 5])
    got = gather_records(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_gather_images_cropped():
    rng = np.random.RandomState(3)
    src = rng.randint(1, 256, (4, 8, 10, 3), np.uint8)   # no zeros in data
    idx = np.array([2, 0])
    ch = np.array([5, 8])
    cw = np.array([7, 10])
    got = gather_images_cropped(src, idx, ch, cw, num_threads=2)
    want = np.zeros((2, 8, 10, 3), np.uint8)
    want[0, :5, :7] = src[2, :5, :7]
    want[1, :8, :10] = src[0]
    np.testing.assert_array_equal(got, want)
