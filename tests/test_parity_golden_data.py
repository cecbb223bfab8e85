"""Golden parity for the data-loading contract, pinned against the actual
reference dataset classes.

tests/fixtures/golden_data.npz (generated offline by
scripts/make_golden_data_fixtures.py) holds tiny raw scene arrays plus what
the reference datasets (/root/reference/nerf_rpn/datasets.py) produced from
them: density->alpha conversion (Front3D exp formula + ScanNet ReLU
variant), SR/semantic target loading, and the deterministic augmentations.
These tests replay the same on-disk layout through our SceneDataset.

Deliberate deviation NOT pinned here: the reference's uint8 branch writes
float alpha back into the uint8 array before /255 (truncates alpha to 0/1,
datasets.py:128-141); our loader skips density->alpha for quantized grids.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # pure numpy, <1 s

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_data.npz")


@pytest.fixture(scope="module")
def fx():
    return dict(np.load(FIX))


@pytest.fixture()
def scene_dir(fx, tmp_path):
    (tmp_path / "features").mkdir()
    (tmp_path / "boxes").mkdir()
    (tmp_path / "out").mkdir()
    (tmp_path / "sem").mkdir()
    np.savez(tmp_path / "features" / "a.npz", rgbsigma=fx["in_rgbsigma"])
    np.save(tmp_path / "boxes" / "a.npy", fx["in_boxes"])
    np.savez(tmp_path / "out" / "a.npz", rgbsigma=fx["in_out_rgbsigma"])
    np.save(tmp_path / "sem" / "a.npy", fx["in_sem"])
    return tmp_path


def test_front3d_loading_matches_reference(fx, scene_dir):
    from nerf_mae_tpu.data.datasets import SceneDataset

    ds = SceneDataset(str(scene_dir / "features"),
                      boxes_path=str(scene_dir / "boxes"))
    item = ds[0]
    np.testing.assert_allclose(item["rgbsigma"], fx["front3d_rgbsigma"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(item["boxes"], fx["front3d_boxes"])


def test_scannet_alpha_matches_reference(fx, scene_dir):
    from nerf_mae_tpu.data.datasets import SceneDataset

    ds = SceneDataset(str(scene_dir / "features"),
                      boxes_path=str(scene_dir / "boxes"),
                      dataset_type="scannet")
    np.testing.assert_allclose(ds[0]["rgbsigma"], fx["scannet_rgbsigma"],
                               rtol=1e-6, atol=1e-7)


def test_sr_pair_matches_reference(fx, scene_dir):
    from nerf_mae_tpu.data.datasets import SceneDataset

    ds = SceneDataset(str(scene_dir / "features"),
                      out_feat_path=str(scene_dir / "out"))
    item = ds[0]
    np.testing.assert_allclose(item["rgbsigma"], fx["sr_in"], rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(item["out_rgbsigma"], fx["sr_out"],
                               rtol=1e-6, atol=1e-7)


def test_semantics_match_reference(fx, scene_dir):
    from nerf_mae_tpu.data.datasets import SceneDataset

    ds = SceneDataset(str(scene_dir / "features"),
                      sem_feat_path=str(scene_dir / "sem"))
    item = ds[0]
    np.testing.assert_allclose(item["rgbsigma"], fx["sem_in"], rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(item["semantics"][None], fx["sem_labels"])


def _augment(fx, boxes, flip, rot):
    """Run our augment_scene with forced draws (probs 0/1 are
    deterministic)."""
    from nerf_mae_tpu.data.datasets import augment_scene

    item = {"rgbsigma": fx["front3d_rgbsigma"].copy(), "boxes": boxes.copy()}
    rng = np.random.RandomState(0)
    return augment_scene(item, rng, flip_prob=flip, rotate_prob=rot,
                         rot_scale_prob=0.0)


def test_rot90_matches_reference(fx):
    out = _augment(fx, fx["front3d_boxes"], flip=0.0, rot=1.0)
    np.testing.assert_allclose(out["rgbsigma"], fx["rot90_rgbsigma"],
                               atol=1e-7)
    np.testing.assert_allclose(out["boxes"], fx["rot90_boxes"], atol=1e-6)
    out = _augment(fx, fx["in_obb"], flip=0.0, rot=1.0)
    np.testing.assert_allclose(out["boxes"], fx["rot90_obb"], atol=1e-6)


def test_flips_match_reference(fx):
    out = _augment(fx, fx["front3d_boxes"], flip=1.0, rot=0.0)
    np.testing.assert_allclose(out["rgbsigma"], fx["flip_rgbsigma"],
                               atol=1e-7)
    np.testing.assert_allclose(out["boxes"], fx["flip_boxes"], atol=1e-6)
    out = _augment(fx, fx["in_obb"], flip=1.0, rot=0.0)
    np.testing.assert_allclose(out["boxes"], fx["flip_obb"], atol=1e-6)


def test_rotate_and_scale_matches_reference(fx):
    from nerf_mae_tpu.data.datasets import rotate_and_scale_scene

    g, b = rotate_and_scale_scene(
        np.ascontiguousarray(fx["front3d_rgbsigma"]), fx["in_obb"].copy(),
        angle=0.12, scale=1.07)
    np.testing.assert_allclose(b, fx["rotscale_obb"], rtol=1e-5, atol=1e-5)
    # grid_sample vs our trilinear gather: same align-corners convention,
    # tiny float divergence only
    np.testing.assert_allclose(g, fx["rotscale_rgbsigma"], atol=1e-4)
