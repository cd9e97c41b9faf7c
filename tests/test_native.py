"""Native C++ data plane vs cv2/numpy oracles."""

import numpy as np
import pytest

from ffwm_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native dataplane unavailable (no g++?)")
    return lib


def test_u8_to_f32(lib, rng):
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    out = native.u8_to_f32(img)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)
    out_p = native.u8_to_f32(img, parallel=4)
    np.testing.assert_array_equal(out, out_p)


def test_hflip(lib, rng):
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    np.testing.assert_array_equal(native.hflip(img), img[:, ::-1])
    f = rng.rand(16, 24, 1).astype(np.float32)
    np.testing.assert_array_equal(native.hflip(f), f[:, ::-1])


def test_threshold(lib, rng):
    img = rng.randint(0, 256, (32, 32, 1), np.uint8)
    out = native.threshold_u8(img.copy())
    np.testing.assert_array_equal(out, np.where(img > 0, 255, 0))


def test_rotate_matches_cv2(lib, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    for ang in (-5, -2, 0, 3, 5):
        ours = native.rotate_u8(img, ang)
        mat = cv2.getRotationMatrix2D((32, 32), ang, 1)
        ref = cv2.warpAffine(img, mat, (64, 64))
        # bilinear rounding can differ by 1 LSB on a few pixels
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert (diff <= 1).mean() > 0.995, (ang, diff.max())


def test_rotate_zero_identity(lib, rng):
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    np.testing.assert_array_equal(native.rotate_u8(img, 0.0), img)
