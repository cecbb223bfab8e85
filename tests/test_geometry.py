"""Geometry op tests: AABB IoU, rotated IoU vs Monte-Carlo oracle, NMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.ops.boxes import (
    aabb_to_obb,
    box_iou_aabb,
    box_volume,
    clip_boxes_to_grid,
    obb_to_aabb,
    small_box_mask,
)
from nerf_mae_tpu.ops.nms import nms_mask
from nerf_mae_tpu.ops.rotated_iou import (
    box2corners,
    box_iou_obb_pairwise,
    diou_3d_loss,
    giou_3d_loss,
    iou_3d,
    rect_intersection_area_2d,
)

pytestmark = pytest.mark.quick


def mc_iou_3d(b1, b2, n=200_000, seed=0):
    """Monte-Carlo rotated-box IoU oracle (numpy, independent of the impl)."""
    rs = np.random.RandomState(seed)

    def corners_aabb(b):
        # loose bound for sampling region
        r = np.hypot(b[3], b[4]) / 2
        return (
            np.array([b[0] - r, b[1] - r, b[2] - b[5] / 2]),
            np.array([b[0] + r, b[1] + r, b[2] + b[5] / 2]),
        )

    lo1, hi1 = corners_aabb(b1)
    lo2, hi2 = corners_aabb(b2)
    lo = np.minimum(lo1, lo2)
    hi = np.maximum(hi1, hi2)
    pts = rs.uniform(lo, hi, (n, 3))

    def inside(b, p):
        d = p[:, :2] - b[:2]
        c, s = np.cos(-b[6]), np.sin(-b[6])
        local = np.stack([c * d[:, 0] - s * d[:, 1], s * d[:, 0] + c * d[:, 1]], 1)
        return (
            (np.abs(local[:, 0]) <= b[3] / 2)
            & (np.abs(local[:, 1]) <= b[4] / 2)
            & (np.abs(p[:, 2] - b[2]) <= b[5] / 2)
        )

    in1, in2 = inside(np.asarray(b1), pts), inside(np.asarray(b2), pts)
    inter = (in1 & in2).mean()
    union = (in1 | in2).mean()
    return inter / union if union > 0 else 0.0


class TestAABB:
    def test_iou_basic(self):
        b1 = jnp.array([[0, 0, 0, 2, 2, 2]], jnp.float32)
        b2 = jnp.array([[1, 1, 1, 3, 3, 3], [0, 0, 0, 2, 2, 2]], jnp.float32)
        iou = np.asarray(box_iou_aabb(b1, b2))
        assert iou[0, 0] == pytest.approx(1 / 15)
        assert iou[0, 1] == pytest.approx(1.0)

    def test_volume_clip_small(self):
        b = jnp.array([[-1, 0, 0, 3, 2, 5]], jnp.float32)
        assert float(box_volume(b)[0]) == 40.0
        clipped = clip_boxes_to_grid(b, (2, 2, 2))
        np.testing.assert_array_equal(np.asarray(clipped), [[0, 0, 0, 2, 2, 2]])
        assert bool(small_box_mask(b, 2.0)[0])
        assert not bool(small_box_mask(b, 3.0)[0])

    def test_aabb_obb_roundtrip(self):
        b = jnp.array([[1, 2, 3, 5, 8, 7]], jnp.float32)
        obb = aabb_to_obb(b)
        np.testing.assert_allclose(np.asarray(obb), [[3, 5, 5, 4, 6, 4, 0]])
        back = obb_to_aabb(obb)
        np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-5)


class TestRotatedIoU:
    def test_corners(self):
        c = np.asarray(box2corners(jnp.array([0.0, 0.0, 2.0, 4.0, 0.0])))
        assert sorted(map(tuple, c.tolist())) == [
            (-1.0, -2.0), (-1.0, 2.0), (1.0, -2.0), (1.0, 2.0)
        ]

    def test_identical_boxes(self):
        b = jnp.array([1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 0.4])
        assert float(iou_3d(b, b)) == pytest.approx(1.0, abs=1e-4)

    def test_disjoint(self):
        b1 = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.3])
        b2 = jnp.array([10.0, 10.0, 0.0, 1.0, 1.0, 1.0, -0.2])
        assert float(iou_3d(b1, b2)) == pytest.approx(0.0, abs=1e-6)

    def test_axis_aligned_matches_aabb(self):
        # theta=0 OBBs must agree with analytic AABB IoU
        o1 = jnp.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.0])
        o2 = jnp.array([2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 0.0])
        got = float(iou_3d(o1, o2))
        assert got == pytest.approx(1 / 15, abs=1e-4)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_monte_carlo(self, seed):
        rs = np.random.RandomState(seed)
        b1 = np.array([*rs.uniform(-1, 1, 2), rs.uniform(-0.5, 0.5),
                       *rs.uniform(1.0, 3.0, 3), rs.uniform(-np.pi, np.pi)])
        b2 = b1 + np.array([*rs.uniform(-1, 1, 3), *rs.uniform(-0.5, 0.5, 3),
                            rs.uniform(-1, 1)])
        b2[3:6] = np.abs(b2[3:6]) + 0.5
        got = float(iou_3d(jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)))
        want = mc_iou_3d(b1, b2, seed=seed)
        assert got == pytest.approx(want, abs=0.02)

    def test_gradients_finite(self):
        b1 = jnp.array([0.0, 0.0, 0.0, 2.0, 3.0, 2.0, 0.3])
        b2 = jnp.array([0.5, 0.2, 0.1, 2.0, 2.0, 2.0, -0.1])
        g = jax.grad(lambda a: iou_3d(a, b2))(b1)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_giou_diou(self):
        # identical boxes: smallest enclosing box == union -> loss 0, even
        # when rotated (the reference-default "smallest" enclosing type)
        b1 = jnp.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0])
        assert float(giou_3d_loss(b1, b1)) == pytest.approx(0.0, abs=1e-4)
        assert float(diou_3d_loss(b1, b1)) == pytest.approx(0.0, abs=1e-4)
        rot = jnp.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.3])
        assert float(giou_3d_loss(rot, rot)) == pytest.approx(0.0, abs=1e-3)
        # the axis-aligned enclosing option penalizes identical rotated boxes
        assert 0.0 < float(giou_3d_loss(rot, rot, "aligned")) < 0.5
        far = jnp.array([10.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.2])
        assert float(giou_3d_loss(b1, far)) > 1.0
        assert float(diou_3d_loss(b1, far)) > 1.0

    def test_smallest_enclosing_box_vs_brute_force(self):
        """Pin the 24-candidate smallest enclosing box against a dense
        rotating-calipers angle sweep."""
        from nerf_mae_tpu.ops.rotated_iou import (
            box2corners,
            smallest_enclosing_box_2d,
        )

        rs = np.random.RandomState(7)
        for _ in range(20):
            b = rs.rand(2, 5).astype(np.float32)
            b[:, 2:4] += 0.5  # nonzero sizes
            b[:, 4] = (b[:, 4] - 0.5) * np.pi
            c1 = box2corners(jnp.asarray(b[0]))
            c2 = box2corners(jnp.asarray(b[1]))
            w, h = smallest_enclosing_box_2d(c1, c2)
            got = float(w) * float(h)
            pts = np.concatenate(
                [np.asarray(c1), np.asarray(c2)], axis=0
            )  # [8, 2]
            best = np.inf
            for ang in np.linspace(0, np.pi / 2, 3601):
                rotm = np.array(
                    [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
                )
                q = pts @ rotm.T
                area = np.ptp(q[:, 0]) * np.ptp(q[:, 1])
                best = min(best, area)
            assert got == pytest.approx(best, rel=2e-3), (got, best)

    def test_smallest_enclosing_box_gradients(self):
        b1 = jnp.array([0.0, 0.0, 0.0, 2.0, 3.0, 2.0, 0.3])
        b2 = jnp.array([0.5, 0.2, 0.1, 2.0, 2.0, 2.0, -0.4])
        g = jax.grad(lambda a: giou_3d_loss(a, b2))(b1)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_pairwise_shape(self):
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.rand(5, 7).astype(np.float32) + 0.5)
        b = jnp.asarray(rs.rand(3, 7).astype(np.float32) + 0.5)
        m = box_iou_obb_pairwise(a, b)
        assert m.shape == (5, 3)
        assert (np.asarray(m) >= 0).all() and (np.asarray(m) <= 1.0 + 1e-5).all()

    def test_rect_intersection_contained(self):
        # box2 fully inside box1 -> area == box2 area (no edge intersections)
        c1 = box2corners(jnp.array([0.0, 0.0, 4.0, 4.0, 0.0]))
        c2 = box2corners(jnp.array([0.0, 0.0, 1.0, 2.0, 0.5]))
        area = float(rect_intersection_area_2d(c1, c2))
        assert area == pytest.approx(2.0, abs=1e-4)


class TestNMS:
    def test_greedy_semantics(self):
        boxes = jnp.array(
            [
                [0, 0, 0, 10, 10, 10],
                [1, 1, 1, 11, 11, 11],  # heavy overlap with box 0
                [20, 20, 20, 30, 30, 30],  # disjoint
                [0, 0, 0, 10, 10, 10],  # duplicate of box 0
            ],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.95])
        keep = np.asarray(nms_mask(boxes, scores, 0.3))
        # highest scorer (dup, idx 3) kept; 0 and 1 suppressed; 2 kept
        np.testing.assert_array_equal(keep, [False, False, True, True])

    def test_valid_and_max_keep(self):
        boxes = jnp.asarray(
            np.stack([np.arange(6) * 20.0] * 3, 1).astype(np.float32)
        )
        boxes = jnp.concatenate([boxes, boxes + 10.0], axis=1)  # 6 disjoint
        scores = jnp.arange(6, dtype=jnp.float32)
        valid = jnp.array([True, True, True, True, False, True])
        keep = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid, max_keep=2))
        assert keep.sum() == 2
        assert not keep[4]  # invalid never kept
        assert keep[5] and keep[3]  # two highest valid scores

    def test_obb_nms(self):
        boxes = jnp.array(
            [
                [0, 0, 0, 4, 4, 4, 0.0],
                [0.2, 0, 0, 4, 4, 4, 0.1],
                [50, 50, 0, 4, 4, 4, 1.0],
            ],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.5, 0.4])
        keep = np.asarray(nms_mask(boxes, scores, 0.3))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_jit_static(self):
        f = jax.jit(lambda b, s: nms_mask(b, s, 0.5))
        rs = np.random.RandomState(0)
        lo = rs.rand(32, 3).astype(np.float32) * 50
        boxes = jnp.asarray(np.concatenate([lo, lo + 1 + rs.rand(32, 3).astype(np.float32) * 10], 1))
        keep = f(boxes, jnp.asarray(rs.rand(32).astype(np.float32)))
        assert keep.shape == (32,)
