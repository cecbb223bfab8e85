"""ScanNet OBB generation (SURVEY row 39): rotating-calipers min-area
rectangle, instance OBB fitting, grid-coordinate filtering, and the PLY/scene
glue — validated against brute-force rotation search, degenerate inputs, and
golden fixtures produced by the reference's own MinimumBoundingBox
(scripts/make_golden_obb_fixtures.py; reference:
data/scannet/MinimumBoundingBox.py:92-130, generate_bbox.py:10-27,
filter_bbox.py:26-59)."""

import json
import os

import numpy as np
import pytest

from nerf_mae_tpu.data.scannet_obb import (
    SCANNET_EXCLUDED_LABELS,
    convex_hull_2d,
    filter_obbs,
    instance_obb,
    min_area_rect,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_obb.npz")


def rect_corners(center, size, angle):
    """4 corners [4, 2] of a rectangle (center, (len_par, len_orth), angle)."""
    u = np.array([np.cos(angle), np.sin(angle)])
    o = np.array([-u[1], u[0]])
    c = np.asarray(center)
    hp, ho = size[0] / 2.0, size[1] / 2.0
    return np.stack([c + sp * hp * u + so * ho * o
                     for sp in (-1, 1) for so in (-1, 1)])


def corners_match(a, b, tol=1e-6):
    """Corner sets equal up to permutation (handles the lp/lo + angle
    symmetry of the rectangle parameterization)."""
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return (d.min(axis=1) < tol).all() and (d.min(axis=0) < tol).all()


def brute_force_min_area(points, n_angles=4096):
    """Dense rotation search: area of the tightest axis-aligned box over a
    fine angle grid (box orientations repeat with period pi; a 4096-point
    grid bounds the optimum from above)."""
    pts = np.asarray(points, dtype=np.float64)
    best = np.inf
    for ang in np.linspace(0, np.pi, n_angles, endpoint=False):
        u = np.array([np.cos(ang), np.sin(ang)])
        o = np.array([-u[1], u[0]])
        p, q = pts @ u, pts @ o
        best = min(best, (p.max() - p.min()) * (q.max() - q.min()))
    return best


@pytest.mark.quick
class TestConvexHull:
    def test_square_hull(self):
        pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.7]])
        hull = convex_hull_2d(pts)
        assert hull.shape == (4, 2)
        assert {tuple(p) for p in hull} == {(0, 0), (1, 0), (1, 1), (0, 1)}

    def test_ccw_order(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(50, 2)
        hull = convex_hull_2d(pts)
        e = np.roll(hull, -1, axis=0) - hull
        cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - \
            e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
        assert (cross > 0).all()

    def test_collinear_degrades(self):
        pts = np.stack([np.arange(5.0), 2 * np.arange(5.0)], axis=1)
        hull = convex_hull_2d(pts)
        assert hull.shape[0] == 2  # the two extremes
        assert {tuple(p) for p in hull} == {(0.0, 0.0), (4.0, 8.0)}

    def test_single_and_duplicate_points(self):
        assert convex_hull_2d(np.array([[3.0, 4.0]])).shape == (1, 2)
        assert convex_hull_2d(np.array([[3.0, 4.0]] * 7)).shape == (1, 2)


@pytest.mark.quick
class TestMinAreaRect:
    def test_beats_or_matches_brute_force(self):
        rng = np.random.RandomState(1)
        for i in range(10):
            n = int(rng.randint(3, 120))
            pts = rng.randn(n, 2) * rng.uniform(0.5, 3.0, 2)
            _, size, _ = min_area_rect(pts)
            area = size[0] * size[1]
            brute = brute_force_min_area(pts)
            # the calipers optimum is exact; the dense grid is an upper bound
            assert area <= brute + 1e-9, (i, area, brute)
            assert area >= brute * (1 - 2e-3), (i, area, brute)

    def test_recovers_rotated_rectangle(self):
        rng = np.random.RandomState(2)
        for ang in (0.0, 0.3, 1.1, -0.7):
            w, l = 4.0, 1.5
            u = np.array([np.cos(ang), np.sin(ang)])
            o = np.array([-u[1], u[0]])
            c0 = rng.uniform(-5, 5, 2)
            # dense points on the rectangle boundary
            t = np.linspace(-0.5, 0.5, 25)
            edge = np.concatenate([
                c0 + w * ti * u + 0.5 * l * si * o
                for ti in t for si in (-1, 1)]).reshape(-1, 2)
            edge2 = np.concatenate([
                c0 + 0.5 * w * si * u + l * ti * o
                for ti in t for si in (-1, 1)]).reshape(-1, 2)
            pts = np.concatenate([edge, edge2])
            center, size, angle = min_area_rect(pts)
            np.testing.assert_allclose(center, c0, atol=1e-9)
            np.testing.assert_allclose(sorted(size), [l, w], atol=1e-9)
            assert corners_match(rect_corners(center, size, angle),
                                 rect_corners(c0, (w, l), ang), tol=1e-8)

    def test_contains_all_points(self):
        rng = np.random.RandomState(3)
        pts = rng.randn(200, 2) * [3, 0.5]
        center, size, angle = min_area_rect(pts)
        u = np.array([np.cos(angle), np.sin(angle)])
        o = np.array([-u[1], u[0]])
        rel = pts - center
        assert (np.abs(rel @ u) <= size[0] / 2 + 1e-9).all()
        assert (np.abs(rel @ o) <= size[1] / 2 + 1e-9).all()

    def test_degenerate_collinear(self):
        pts = np.stack([np.arange(6.0), np.arange(6.0)], axis=1)
        center, size, angle = min_area_rect(pts)
        np.testing.assert_allclose(center, [2.5, 2.5], atol=1e-12)
        np.testing.assert_allclose(size, [np.hypot(5, 5), 0.0], atol=1e-12)
        assert abs(angle - np.pi / 4) < 1e-12

    def test_degenerate_single_point(self):
        center, size, angle = min_area_rect(np.array([[2.0, -3.0]] * 4))
        np.testing.assert_allclose(center, [2.0, -3.0])
        np.testing.assert_allclose(size, [0.0, 0.0])


@pytest.mark.quick
class TestInstanceOBB:
    def test_z_extent_and_shape(self):
        rng = np.random.RandomState(4)
        v = rng.randn(60, 3)
        v[:, 2] = rng.uniform(1.0, 3.5, 60)
        v[0, 2], v[1, 2] = 1.0, 3.5
        obb = instance_obb(v)
        assert obb.shape == (7,)
        np.testing.assert_allclose(obb[2], 2.25, atol=1e-12)
        np.testing.assert_allclose(obb[5], 2.5, atol=1e-12)

    def test_single_voxel_instance(self):
        # one point: zero-size box at the point, no crash (the reference's
        # qhull would raise)
        obb = instance_obb(np.array([[1.0, 2.0, 3.0]]))
        np.testing.assert_allclose(obb, [1, 2, 3, 0, 0, 0, 0], atol=1e-12)

    def test_rejects_empty(self):
        with pytest.raises(ValueError):
            instance_obb(np.zeros((0, 3)))


@pytest.mark.quick
class TestGoldenParity:
    """Pins our math to the reference's MinimumBoundingBox outputs."""

    @pytest.fixture(scope="class")
    def golden(self):
        assert os.path.exists(FIXTURE), "run scripts/make_golden_obb_fixtures.py"
        return np.load(FIXTURE)

    def test_min_area_rect_matches_reference(self, golden):
        n = sum(1 for k in golden.files if k.startswith("cloud_"))
        assert n >= 10
        for i in range(n):
            cloud = golden[f"cloud_{i}"]
            cx, cy, lp, lo, ang, area = golden[f"rect_{i}"]
            center, size, angle = min_area_rect(cloud)
            np.testing.assert_allclose(size[0] * size[1], area, rtol=1e-9,
                                       err_msg=f"cloud {i} area")
            assert corners_match(
                rect_corners(center, size, angle),
                rect_corners((cx, cy), (lp, lo), ang), tol=1e-7), f"cloud {i}"

    def test_instance_obb_matches_reference(self, golden):
        n = sum(1 for k in golden.files if k.startswith("verts_"))
        assert n >= 5
        for i in range(n):
            ours = instance_obb(golden[f"verts_{i}"])
            ref = golden[f"obb_{i}"]
            # z center/extent exact; xy rectangle compared corner-wise
            np.testing.assert_allclose(ours[[2, 5]], ref[[2, 5]], atol=1e-9)
            assert corners_match(
                rect_corners(ours[:2], ours[3:5], ours[6]),
                rect_corners(ref[:2], ref[3:5], ref[6]), tol=1e-7), f"verts {i}"


@pytest.mark.quick
class TestFilter:
    def test_rescale_and_filters(self):
        # two instances spanning [0,10]^2 x [0,2] world; grid res 160
        obbs = np.array([
            [5.0, 5.0, 1.0, 4.0, 2.0, 1.0, 0.3],   # kept
            [2.0, 2.0, 0.5, 0.1, 4.0, 1.0, 0.0],   # min size: 0.1/10*160 = 1.6 < 8
            [8.0, 8.0, 1.5, 4.0, 4.0, 1.0, 0.0],   # excluded label
        ])
        labels = ["chair", "table", "wall"]
        min_pts = np.array([[0, 0, 0], [1, 1, 0], [6, 6, 1]], dtype=float)
        max_pts = np.array([[10, 10, 2], [3, 3, 1], [10, 10, 2]], dtype=float)
        res = np.array([160, 160, 32])
        out, keep = filter_obbs(obbs, labels, min_pts, max_pts, res, min_size=8)
        assert keep.tolist() == [True, False, False]
        assert out.shape == (1, 7)
        # center (5,5,1) -> (80, 80, 16); sizes (4,2,1) -> (64, 32, 16)
        np.testing.assert_allclose(out[0], [80, 80, 16, 64, 32, 16, 0.3])

    def test_excluded_list_is_reference_set(self):
        # spot-check the data constant against filter_bbox.py:8-23
        for lab in ("wall", "floor", "door", "picture", "curtain", "pipe"):
            assert lab in SCANNET_EXCLUDED_LABELS
        for lab in ("chair", "table", "sofa", "bed", "desk"):
            assert lab not in SCANNET_EXCLUDED_LABELS

    def test_anisotropic_resolution(self):
        obbs = np.array([[1.0, 2.0, 0.5, 2.0, 4.0, 1.0, 0.0]])
        out, keep = filter_obbs(
            obbs, ["chair"], np.array([[0, 0, 0.0]]), np.array([[4, 8, 1.0]]),
            np.array([100, 200, 50]), min_size=1)
        np.testing.assert_allclose(out[0, :3], [25, 50, 25])
        np.testing.assert_allclose(out[0, 3:6], [50, 100, 50])


@pytest.mark.quick
class TestSceneGlue:
    def _write_scene(self, tmp_path, fmt="binary_little_endian"):
        import struct

        scene = tmp_path / "scene0000_00"
        scene.mkdir()
        # two instances: a chair (2 segments) and a wall (1 segment)
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1],      # seg 10, 11
            [5, 5, 0], [6, 5, 0], [6, 6, 2],                 # seg 20
        ], dtype=np.float32)
        segs = [10, 10, 11, 11, 20, 20, 20]
        ply = scene / "scene0000_00_vh_clean_2.ply"
        if fmt == "ascii":
            lines = ["ply", "format ascii 1.0",
                     f"element vertex {len(verts)}",
                     "property float x", "property float y",
                     "property float z", "end_header"]
            lines += [" ".join(f"{v:.6f}" for v in row) for row in verts]
            ply.write_text("\n".join(lines) + "\n")
        else:
            hdr = ("ply\nformat binary_little_endian 1.0\n"
                   f"element vertex {len(verts)}\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "end_header\n").encode()
            body = b"".join(struct.pack("<3f", *row) for row in verts)
            ply.write_bytes(hdr + body)
        (scene / "scene0000_00_vh_clean.aggregation.json").write_text(json.dumps({
            "segGroups": [
                {"objectId": 0, "label": "chair", "segments": [10, 11]},
                {"objectId": 1, "label": "wall", "segments": [20]},
                {"objectId": 2, "label": "lamp", "segments": [99]},  # empty
            ],
            "segmentsFile": "x",
        }))
        (scene / "scene0000_00_vh_clean_2.0.010000.segs.json").write_text(
            json.dumps({"segIndices": segs}))
        return scene

    @pytest.mark.parametrize("fmt", ["ascii", "binary_little_endian"])
    def test_process_scene(self, tmp_path, fmt):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        from generate_scannet_obb import process_scene, read_ply_vertices

        scene = self._write_scene(tmp_path, fmt)
        out = tmp_path / "out"
        out.mkdir()
        d = process_scene(str(scene), str(out))
        assert json.load(open(out / "scene0000_00.json")) == d
        inst = {x["label"]: x for x in d["instances"]}
        assert inst["chair"]["min_pt"] == [0, 0, 0]
        assert inst["chair"]["max_pt"] == [1, 1, 1]
        obb = np.asarray(inst["chair"]["obb"])
        np.testing.assert_allclose(obb[2], 0.5)   # z center
        np.testing.assert_allclose(obb[5], 1.0)   # z extent
        np.testing.assert_allclose(sorted(obb[3:5]), [1.0, 1.0], atol=1e-9)
        assert inst["lamp"]["obb"] is None        # zero-vertex instance
        # PLY reader sanity
        v = read_ply_vertices(
            str(scene / "scene0000_00_vh_clean_2.ply"))
        assert v.shape == (7, 3)
        np.testing.assert_allclose(v[3], [0, 1, 1], atol=1e-6)

    def test_filter_scene_end_to_end(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        from generate_scannet_obb import filter_scene, process_scene

        scene = self._write_scene(tmp_path)
        objdir = tmp_path / "obj"
        objdir.mkdir()
        process_scene(str(scene), str(objdir))
        np.savez(tmp_path / "scene0000_00.npz",
                 rgbsigma=np.zeros((4, 4, 4, 4), np.float32),
                 resolution=np.array([160, 160, 160]))
        filter_scene(str(tmp_path / "scene0000_00.npz"),
                     str(objdir / "scene0000_00.json"),
                     str(tmp_path / "scene0000_00.npy"),
                     str(tmp_path / "scene0000_00_f.json"), min_size=8)
        boxes = np.load(tmp_path / "scene0000_00.npy")
        kept = json.load(open(tmp_path / "scene0000_00_f.json"))["instances"]
        # wall is excluded by label; chair survives (its grid-size >= 8)
        assert [x["label"] for x in kept] == ["chair"]
        assert boxes.shape == (1, 7)
        assert boxes[0, 3:6].min() >= 8
