"""Native C++ collate/augment library vs numpy reference semantics."""

import numpy as np
import pytest

from nerf_mae_tpu.data import native
from nerf_mae_tpu.data.datasets import rotate_and_scale_scene


@pytest.fixture(scope="module")
def grid():
    return np.random.RandomState(0).rand(10, 12, 8, 4).astype(np.float32)


def test_builds():
    assert native.available(), "native library failed to build"


def test_pad_to_cube(grid):
    out = native.pad_to_cube(grid, 16)
    assert out.shape == (16, 16, 16, 4)
    np.testing.assert_array_equal(out[:10, :12, :8], grid)
    assert (out[10:] == 0).all() and (out[:, 12:] == 0).all()
    # crop path
    out = native.pad_to_cube(grid, 6)
    np.testing.assert_array_equal(out, grid[:6, :6, :6])


@pytest.mark.parametrize("axis", [0, 1])
def test_flip(grid, axis):
    np.testing.assert_array_equal(
        native.flip_axis(grid, axis), np.flip(grid, axis)
    )


def test_rot90(grid):
    want = np.flip(np.swapaxes(grid, 0, 1), 0)
    np.testing.assert_array_equal(native.rot90_wl(grid), want)


def test_rotate_scale_matches_numpy(grid):
    g = np.random.RandomState(1).rand(9, 9, 9, 4).astype(np.float32)
    got = native.rotate_scale(g, 0.2, 1.05)
    want, _ = rotate_and_scale_scene(g, None, 0.2, 1.05)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate_scale_identity(grid):
    got = native.rotate_scale(grid, 0.0, 1.0)
    np.testing.assert_allclose(got, grid, atol=1e-6)
