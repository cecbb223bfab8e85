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


def test_pad_to_patches_matches_numpy(grid):
    from nerf_mae_tpu.ops.patchify import patchify_np

    g = np.random.RandomState(2).rand(9, 7, 11, 4).astype(np.float32)
    got = native.pad_to_patches(g, 12, 4)
    want = patchify_np(native.pad_to_cube(g, 12)[None], 4)[0]
    assert got.shape == (3, 3, 3, 64, 4)
    np.testing.assert_array_equal(got, want)


def test_mae_batch_iterator_patch_major():
    from nerf_mae_tpu.data.datasets import mae_batch_iterator

    scenes = [np.random.RandomState(i).rand(14, 16, 12, 4).astype(np.float32)
              for i in range(4)]

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"rgbsigma": scenes[i]}

    b = next(mae_batch_iterator(_DS(), 2, 16, shuffle=False, loop=False,
                                patch_major=4, workers=2))
    assert b["grids"].shape == (2, 4, 4, 4, 64, 4)
    np.testing.assert_array_equal(b["sizes"][0], [14, 16, 12])
    # values match the voxel-layout iterator + patchify
    from nerf_mae_tpu.ops.patchify import patchify_np

    b2 = next(mae_batch_iterator(_DS(), 2, 16, shuffle=False, loop=False))
    np.testing.assert_array_equal(b["grids"], patchify_np(b2["grids"], 4))
