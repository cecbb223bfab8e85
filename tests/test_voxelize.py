"""Voxelization pipeline tests: depth back-projection, majority voting,
instance boxes."""

import numpy as np
import pytest

from nerf_mae_tpu.data.voxelize import (
    boxes_from_instance_labels,
    depth_to_pointcloud,
    voxelize_labels,
)

pytestmark = pytest.mark.quick


class TestDepthToPointcloud:
    def test_center_pixel_on_axis(self):
        k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        depth = np.zeros((48, 64), np.float32)
        depth[24, 32] = 2.0  # principal point
        pts, _ = depth_to_pointcloud(depth, k, np.eye(4))
        np.testing.assert_allclose(pts, [[0, 0, 2.0]], atol=1e-6)

    def test_pose_transform_and_labels(self):
        k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        depth = np.zeros((48, 64), np.float32)
        depth[24, 32] = 1.0
        labels = np.full((48, 64), 7, np.int32)
        c2w = np.eye(4)
        c2w[:3, 3] = [5, 6, 7]
        pts, lab = depth_to_pointcloud(depth, k, c2w, labels)
        np.testing.assert_allclose(pts, [[5, 6, 8.0]], atol=1e-6)
        assert lab.tolist() == [7]

    def test_max_depth_filter(self):
        k = np.eye(3) * 100
        k[0, 2] = k[1, 2] = 2
        k[2, 2] = 1
        depth = np.full((4, 4), 10.0, np.float32)
        pts, _ = depth_to_pointcloud(depth, k, np.eye(4), max_depth=5.0)
        assert pts.shape[0] == 0


class TestVoxelize:
    def test_majority_vote(self):
        # two points in one voxel with label 2, one with label 1 -> label 2
        pts = np.array([[0.5, 0.5, 0.5]] * 3, np.float32)
        labels = np.array([2, 2, 1])
        grid = voxelize_labels(pts, labels, (0, 0, 0), (4, 4, 4), (4, 4, 4))
        assert grid.shape == (4, 4, 4)
        assert grid[0, 0, 0] == 2
        assert grid.sum() == 2  # everything else void

    def test_out_of_bbox_clipped(self):
        pts = np.array([[100.0, 100, 100]], np.float32)
        grid = voxelize_labels(pts, np.array([3]), (0, 0, 0), (4, 4, 4), (4, 4, 4))
        assert grid[3, 3, 3] == 3

    def test_instance_boxes(self):
        vox = np.zeros((10, 10, 10), np.int32)
        vox[2:5, 3:7, 1:4] = 1
        vox[8, 8, 8] = 2  # too small (1 voxel)
        boxes = boxes_from_instance_labels(vox, min_voxels=4)
        assert boxes.shape == (1, 6)
        np.testing.assert_array_equal(boxes[0], [2, 3, 1, 5, 7, 4])


class TestOpenGLConvention:
    """The Front3D/HM3D BlenderProc camera math
    (reference: front3d_depth2pc.py:208-221, hm3d_depth2pc.py:254-267)."""

    def _ref_depth2pc(self, depth, fx, fy, cx, cy, c2w):
        # literal transcription of the reference's loop for the oracle
        H, W = depth.shape
        x = np.linspace(0, H - 1, H, endpoint=True)
        y = np.linspace(0, W - 1, W, endpoint=True)
        j, i = np.meshgrid(x, y, indexing="ij")
        c_x = (i + 0.5 - cx) / fx * depth
        c_y = (H - j - 0.5 - cy) / fy * depth
        c_z = -depth
        c = np.stack([c_x, c_y, c_z], -1).reshape(-1, 3)
        w_coord = (c2w[:3, :3] @ c.T + c2w[:3, 3][:, None]).T
        valid = (depth.reshape(-1) > 0) & (depth.reshape(-1) < 15)
        return w_coord[valid]

    def test_matches_reference_math(self):
        rs = np.random.RandomState(0)
        depth = rs.uniform(0.5, 20.0, (6, 8)).astype(np.float32)
        fx, fy, cx, cy = 10.0, 11.0, 4.0, 3.0
        k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        c2w = np.eye(4)
        c2w[:3, :3] = np.array(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32
        )
        c2w[:3, 3] = [1.0, -2.0, 3.0]
        ref = self._ref_depth2pc(depth, fx, fy, cx, cy, c2w)
        pts, _ = depth_to_pointcloud(depth, k, c2w, max_depth=15.0,
                                     convention="opengl")
        np.testing.assert_allclose(np.sort(pts, 0), np.sort(ref, 0),
                                   rtol=1e-5, atol=1e-5)

    def test_depth2pc_scene_accumulates_and_subsamples(self):
        from nerf_mae_tpu.data.voxelize import depth2pc_scene

        depth = np.full((4, 4), 2.0, np.float32)
        mask = np.zeros((4, 4), np.int32)
        mask[:, 2:] = 7
        k = np.array([[4.0, 0, 2], [0, 4.0, 2], [0, 0, 1]])
        out = depth2pc_scene([depth, depth], [mask, mask],
                             [np.eye(4), np.eye(4)], k, points_per_obj=10)
        assert set(out) == {0, 7}
        assert out[7].shape == (10, 3)  # 16 accumulated -> subsampled
        assert out[0].shape[1] == 3
