"""save_transforms round-trip: raw poses + world boxes -> transforms.json ->
preprocess_boxes -> voxel boxes must land where the (independently
rasterized) scene geometry is. Covers SURVEY row 39's pose/box-alignment
math (reference: data/hm3d/save_transforms_with_boxes.py:118-342,
save_transforms_with_all_boxes.py:380-472, data/hypersim/
preprocess_boxes.py:75-132)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from preprocess_boxes import PERM, process_obbs  # noqa: E402
from save_transforms import (  # noqa: E402
    build_transforms,
    filter_boxes,
    load_boxes_json,
    load_category_mapping,
    main as save_transforms_main,
    ngp_scale_offset,
    obb_corners,
    transform_obbs,
    transform_poses_pca,
)


def _camera_poses(n=24, seed=0):
    """c2w poses whose centers have horizontal-major covariance (so the
    PCA frame's vertical axis stays vertical, like real room captures)."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    centers = np.stack([
        10.0 + 4.0 * np.cos(t) + 0.1 * rng.randn(n),
        -3.0 + 2.0 * np.sin(t) + 0.1 * rng.randn(n),
        1.5 + 0.3 * rng.randn(n),
    ], axis=1)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = centers
    return poses


def _scene_objects():
    """(extents, orientations, positions) of world OBBs near the cameras."""
    exts = [np.array([2.0, 1.0, 0.8]), np.array([0.9, 1.6, 1.2])]
    oris = [np.eye(3), np.eye(3)]
    poss = [np.array([9.0, -3.5, 0.6]), np.array([12.0, -2.0, 0.9])]
    return exts, oris, poss


@pytest.mark.quick
class TestPoseNormalization:
    def test_poses_land_in_unit_cube_and_transform_is_consistent(self):
        poses = _camera_poses()
        poses_rec, transform = transform_poses_pca(poses)
        centers = poses_rec[:, :3, 3]
        assert np.abs(centers).max() <= 1.0 + 1e-9
        assert np.isclose(np.abs(centers).max(), 1.0)
        # the returned transform must reproduce the returned poses:
        # translations exactly; rotation columns up to the uniform scale
        # (the reference scales only translations in the returned poses —
        # ref save_transforms_with_boxes.py:161-163)
        got = (transform @ poses)[:, :3, :4]
        s = np.cbrt(abs(np.linalg.det(transform[:3, :3])))
        np.testing.assert_allclose(got[:, :3, 3], poses_rec[:, :3, 3],
                                   atol=1e-9)
        np.testing.assert_allclose(got[:, :3, :3] / s, poses_rec[:, :3, :3],
                                   atol=1e-9)

    def test_transform_is_a_similarity(self):
        _, transform = transform_poses_pca(_camera_poses())
        m = transform[:3, :3]
        s = np.cbrt(abs(np.linalg.det(m)))
        r = m / s
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_camera_up_points_up(self):
        """The y-flip branch (ref :156-158) must leave the mean camera
        y-axis with a non-negative z component."""
        poses_rec, _ = transform_poses_pca(_camera_poses())
        assert poses_rec.mean(axis=0)[2, 1] >= 0


@pytest.mark.quick
class TestBoxAlignment:
    def test_boxes_follow_poses(self):
        """Object corners carried through transform_obbs must equal the
        raw corners mapped through the pose-normalizing similarity."""
        exts, oris, poss = _scene_objects()
        _, transform = transform_poses_pca(_camera_poses())
        e2, o2, p2 = transform_obbs(exts, oris, poss, transform)
        for e, o, p, en, on, pn in zip(exts, oris, poss, e2, o2, p2):
            raw = obb_corners(e, o, p)
            mapped = raw @ transform[:3, :3].T + transform[:3, 3]
            got = obb_corners(en, on, pn)
            # corner sets are order-sensitive here because transform_obbs
            # preserves the corner enumeration
            np.testing.assert_allclose(got, mapped, atol=1e-9)

    def test_ngp_scale_offset_places_room_in_unit_cube(self):
        lo, hi = np.array([-0.8, -0.5, -0.1]), np.array([0.7, 0.9, 0.4])
        scale, offset = ngp_scale_offset((lo, hi))
        ngp_lo, ngp_hi = lo * scale + offset, hi * scale + offset
        center = (ngp_lo + ngp_hi) / 2
        np.testing.assert_allclose(center, 0.5, atol=1e-12)
        assert np.max(ngp_hi - ngp_lo) <= 1.5 + 1e-12


@pytest.mark.quick
class TestEndToEndRoundTrip:
    def test_voxel_boxes_cover_rasterized_geometry(self, tmp_path):
        """The full chain: raw poses + boxes -> transforms.json ->
        process_obbs -> [N, 7] voxel boxes. Independently rasterize the
        normalized-frame objects into the grid; each voxel box must sit on
        its object's occupancy centroid with a matching volume."""
        poses = _camera_poses()
        exts, oris, poss = _scene_objects()
        out = build_transforms(
            poses, [f"images/{i}.png" for i in range(len(poses))],
            boxes=(exts, oris, poss))

        res = 64
        room_lo, room_hi = np.asarray(out["room_bbox"])
        scale, offset = out["scale"], np.asarray(out["offset"])
        # emulate the instant-ngp extraction npz metadata: bbox in ngp
        # coords = (world * scale + offset) with the xyz->yzx axis cycle
        # nerf_matrix_to_ngp applies to positions (PERM is its inverse)
        def to_ngp(p):
            return (np.asarray(p) * scale + offset)[[1, 2, 0]]

        meta = {
            "resolution": np.array([res, res, res]),
            "bbox_min": to_ngp(room_lo), "bbox_max": to_ngp(room_hi),
            "scale": scale, "offset": offset, "from_mitsuba": False,
        }
        np.testing.assert_allclose(PERM @ meta["bbox_min"],
                                   room_lo * scale + offset, atol=1e-12)

        boxes = process_obbs({"bounding_boxes": out["bounding_boxes"]}, meta)
        assert boxes.shape == (2, 7)
        assert (boxes[:, :3] >= 0).all() and (boxes[:, :3] <= res).all()

        # rasterize each normalized-frame object into the voxel grid
        idx = np.stack(np.meshgrid(*([np.arange(res)] * 3), indexing="ij"),
                       axis=-1).reshape(-1, 3) + 0.5
        world = room_lo + idx / res * (room_hi - room_lo)  # voxel centers
        for bi, obj in enumerate(out["bounding_boxes"]):
            o = np.asarray(obj["orientation"])
            local = (world - np.asarray(obj["position"])) @ o
            inside = (np.abs(local) <= np.asarray(obj["extents"]) / 2).all(1)
            occ = idx[inside]  # occupied voxel centers (voxel units)
            assert len(occ), f"object {bi} rasterized to nothing"
            centroid = occ.mean(axis=0)
            # the processed voxel box must sit on the occupancy centroid
            np.testing.assert_allclose(boxes[bi, :3], centroid, atol=1.5)
            # and enclose a matching volume (voxelization granularity)
            vol_box = float(np.prod(boxes[bi, 3:6]))
            assert 0.7 <= vol_box / len(occ) <= 1.4, (vol_box, len(occ))

    def test_cli_end_to_end(self, tmp_path):
        """Driver smoke: poses/*.json + HM3D-format boxes -> output json
        with frames, bounding_boxes, room_bbox, scale, offset."""
        scene = tmp_path / "scene0"
        (scene / "poses").mkdir(parents=True)
        for i, pose in enumerate(_camera_poses(n=8)):
            with open(scene / "poses" / f"{i}.json", "w") as f:
                json.dump({"pose": pose.tolist()}, f)
        # HM3D AABB format in y-up coords (swap_yz restores z-up)
        exts, _, poss = _scene_objects()
        items = []
        for e, p in zip(exts, poss):
            lo, hi = p - e / 2, p + e / 2
            items.append({"class_name": "chair",
                          "bbox": [lo[[0, 2, 1]].tolist(),
                                   hi[[0, 2, 1]].tolist()]})
        items.append({"class_name": "wall",
                      "bbox": [[0, 0, 0], [20, 4, 8]]})
        boxes_path = tmp_path / "boxes.json"
        with open(boxes_path, "w") as f:
            json.dump(items, f)
        tsv = tmp_path / "map.tsv"
        tsv.write_text("category    nyu40id\nchair    5\nwall    1\n")

        out_path = tmp_path / "transforms.json"
        rc = save_transforms_main([
            "--input_dir", str(scene), "--boxes_json", str(boxes_path),
            "--output", str(out_path), "--swap_yz", "--filter_by_label",
            "--category_mapping", str(tsv),
        ])
        assert rc == 0
        with open(out_path) as f:
            got = json.load(f)
        assert len(got["frames"]) == 8
        # the wall is label-filtered; the two chairs survive
        assert len(got["bounding_boxes"]) == 2
        assert "room_bbox" in got and "offset" in got
        assert got["scale"] != 1.0
        m = np.asarray(got["frames"][0]["transform_matrix"])
        assert m.shape == (4, 4) and np.isclose(m[3, 3], 1.0)


@pytest.mark.quick
class TestBoxLoadingAndFiltering:
    def test_swap_yz(self, tmp_path):
        p = tmp_path / "b.json"
        with open(p, "w") as f:
            json.dump([{"class_name": "bed",
                        "bbox": [[1, 2, 3], [4, 6, 5]]}], f)
        e, o, pos, names = load_boxes_json(str(p), swap_yz=True)
        np.testing.assert_allclose(e[0], [3, 2, 4])  # extents z<->y swapped
        np.testing.assert_allclose(pos[0], [2.5, 4.0, 4.0])
        assert names == ["bed"]

    def test_label_filter_sofa_remap_and_min_extent(self):
        mapping = {"couch": 6, "wall": 1}
        exts = [np.ones(3), np.ones(3), np.array([0.05, 1, 1])]
        oris = [np.eye(3)] * 3
        poss = [np.zeros(3)] * 3
        names = ["sofa", "wall", "table"]
        e, o, p, n = filter_boxes(exts, oris, poss, names, mapping,
                                  filter_by_label=True, min_extent=0.1)
        # sofa -> couch (nyu 6, kept); wall excluded; table too thin
        assert n == ["sofa"]

    def test_category_mapping_four_space_tsv(self, tmp_path):
        tsv = tmp_path / "m.tsv"
        tsv.write_text("index    category    nyu40id\n1    chair    5\n"
                       "2    couch    6\n")
        m = load_category_mapping(str(tsv))
        assert m == {"chair": 5, "couch": 6}
