"""Native C++ host ops vs numpy reference."""

import numpy as np
import pytest

from tpugan import native


def test_batch_gather_matches_numpy(rng):
    imgs = rng.integers(0, 256, size=(100, 16, 16, 3)).astype(np.uint8)
    idx = rng.permutation(100)[:32].astype(np.int64)
    out = native.batch_gather(imgs, idx)
    np.testing.assert_array_equal(out, imgs[idx])


def test_batch_gather_with_flip(rng):
    imgs = rng.integers(0, 256, size=(50, 8, 8, 1)).astype(np.uint8)
    idx = np.arange(50, dtype=np.int64)
    flip = (rng.random(50) < 0.5).astype(np.uint8)
    out = native.batch_gather(imgs, idx, flip)
    ref = imgs.copy()
    sel = flip.astype(bool)
    ref[sel] = ref[sel, :, ::-1, :]
    np.testing.assert_array_equal(out, ref)


def test_normalize_bit_exact(rng):
    imgs = rng.integers(0, 256, size=(16, 8, 8, 3)).astype(np.uint8)
    out = native.normalize_u8_f32(imgs)
    ref = imgs.astype(np.float32) / np.float32(127.5) - 1.0
    np.testing.assert_array_equal(out, ref)


def test_fallback_path_noncontiguous(rng):
    imgs = rng.integers(0, 256, size=(20, 8, 16, 3)).astype(np.uint8)
    view = imgs[:, :, ::2, :]  # non-contiguous -> numpy fallback
    idx = np.arange(10, dtype=np.int64)
    out = native.batch_gather(view, idx)
    np.testing.assert_array_equal(out, view[idx])


def test_batch_gather_rejects_out_of_range(rng):
    """Both paths share numpy's bounds contract: the C++ path must raise
    (it would otherwise memcpy from unowned memory) and so must the
    fallback."""
    imgs = rng.integers(0, 256, size=(10, 4, 4, 1)).astype(np.uint8)
    for bad in (np.array([0, 10], np.int64), np.array([-11], np.int64)):
        with pytest.raises(IndexError):
            native.batch_gather(imgs, bad)


def test_batch_gather_negative_indices_wrap_like_numpy(rng):
    imgs = rng.integers(0, 256, size=(10, 4, 4, 1)).astype(np.uint8)
    idx = np.array([-1, -10, 3], np.int64)
    out = native.batch_gather(imgs, idx)
    np.testing.assert_array_equal(out, imgs[np.array([9, 0, 3])])
