"""Voxelization pipeline tests: depth back-projection, majority voting,
instance boxes."""

import numpy as np

from nerf_mae_tpu.data.voxelize import (
    boxes_from_instance_labels,
    depth_to_pointcloud,
    voxelize_labels,
)


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
