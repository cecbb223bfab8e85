"""Headless camera-visualizer export (scripts/visualize_cameras.py).

Pins the frustum geometry and PLY line-set format against the reference
viewer's topology (data/visualize_cameras/visualize_nerf_front3d.py:
115-158): 5 vertices / 8 edges per camera, apex at the camera center,
image-corner rim at the requested depth with half-width
length*tan(camera_angle_x/2).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from nerf_mae_tpu.viz import (  # noqa: E402
    box_lineset,
    camera_frustum_lineset,
    merge_linesets,
    save_lineset_ply,
)
import visualize_cameras as vc  # noqa: E402


def parse_lineset_ply(path):
    with open(path) as f:
        lines = [l.strip() for l in f]
    nv = ne = None
    for l in lines:
        if l.startswith("element vertex"):
            nv = int(l.split()[-1])
        elif l.startswith("element edge"):
            ne = int(l.split()[-1])
    body = lines[lines.index("end_header") + 1:]
    verts = np.array([[float(x) for x in l.split()] for l in body[:nv]])
    edges = np.array([[int(x) for x in l.split()[:2]] for l in body[nv:nv + ne]])
    cols = np.array([[int(x) for x in l.split()[2:5]] for l in body[nv:nv + ne]])
    return verts, edges, cols


def test_frustum_geometry():
    # 90-degree hfov, square aspect, unit length: rim corners at |x|=|y|=1,
    # z = -1 (OpenGL forward), apex at origin
    pts, ln, cols = camera_frustum_lineset(
        np.eye(4), camera_angle_x=np.pi / 2, aspect=1.0, length=1.0)
    assert pts.shape == (5, 3) and ln.shape == (8, 2)
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.abs(pts[1:, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.abs(pts[1:, 1]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(pts[1:, 2], -1.0, rtol=1e-6)
    # reference raw +z convention flips only z
    pts_pz, _, _ = camera_frustum_lineset(
        np.eye(4), np.pi / 2, aspect=1.0, length=1.0, forward=+1.0)
    np.testing.assert_allclose(pts_pz[1:, 2], 1.0, rtol=1e-6)
    # rigid transform moves the apex to the camera center
    c2w = np.eye(4)
    c2w[:3, 3] = [2.0, -3.0, 5.0]
    pts_t, _, _ = camera_frustum_lineset(c2w, np.pi / 2, 1.0, 1.0)
    np.testing.assert_allclose(pts_t[0], [2, -3, 5], atol=1e-6)
    np.testing.assert_allclose(pts_t - pts_t[0], pts, atol=1e-6)


def test_merge_and_ply_roundtrip(tmp_path):
    f1 = camera_frustum_lineset(np.eye(4), np.pi / 3, 0.75, 0.2,
                                color=(0, 1, 0))
    box = box_lineset(np.array([[0, 0, 0, 1, 1, 1]], np.float32),
                      color=(1, 0.8, 0))
    pts, ln, cols = merge_linesets([f1, box])
    assert len(pts) == 5 + 8 and len(ln) == 8 + 12
    assert ln.max() == len(pts) - 1  # re-based indices in range
    out = str(tmp_path / "ls.ply")
    save_lineset_ply(out, pts, ln, cols)
    v, e, c = parse_lineset_ply(out)
    np.testing.assert_allclose(v, pts, atol=1e-4)
    np.testing.assert_array_equal(e, ln)
    assert (c[:8] == [0, 255, 0]).all() and (c[8:] == [255, 204, 0]).all()


def test_cli_end_to_end(tmp_path):
    # two-camera scene with a room_bbox and one general-rotation OBB,
    # in the save_transforms.py transforms.json schema
    ang = np.pi / 5
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    c2w_b = np.eye(4)
    c2w_b[:3, 3] = [0.5, 0.2, 1.0]
    tdict = {
        "camera_angle_x": 0.9, "w": 640.0, "h": 480.0,
        "frames": [
            {"file_path": "images/0000.png",
             "transform_matrix": np.eye(4).tolist()},
            {"file_path": "images/0001.png",
             "transform_matrix": c2w_b.tolist()},
        ],
        "room_bbox": [[-1, -1, -1], [1, 1, 1]],
        "bounding_boxes": [{"extents": [0.4, 0.6, 0.8],
                            "orientation": rot.tolist(),
                            "position": [0.1, -0.2, 0.3]}],
    }
    scene = tmp_path / "scene" / "train"
    scene.mkdir(parents=True)
    with open(scene / "transforms.json", "w") as f:
        json.dump(tdict, f)
    out = str(tmp_path / "cams.ply")
    vc.main(["--scene", str(tmp_path / "scene"), "--out", out])
    v, e, c = parse_lineset_ply(out)
    # 2 frusta (5 verts / 8 edges each) + room bbox + OBB (8 verts /
    # 12 edges each)
    assert len(v) == 2 * 5 + 8 + 8
    assert len(e) == 2 * 8 + 12 + 12
    np.testing.assert_allclose(v[5], [0.5, 0.2, 1.0], atol=1e-5)  # apex B
    # OBB corners: center of the last 8 vertices is the box position
    np.testing.assert_allclose(v[-8:].mean(0), [0.1, -0.2, 0.3], atol=1e-5)
    # edge diagonals match the rotated extents (no axis-aligned collapse)
    d = v[-8:] - v[-8:].mean(0)
    np.testing.assert_allclose(
        2 * np.linalg.norm(d, axis=1).max(),
        np.linalg.norm([0.4, 0.6, 0.8]), rtol=1e-5)
    # subsample drops frame B
    out2 = str(tmp_path / "cams2.ply")
    vc.main(["--scene", str(tmp_path / "scene"), "--out", out2,
             "--subsample", "2", "--no_boxes"])
    v2, e2, _ = parse_lineset_ply(out2)
    assert len(v2) == 5 and len(e2) == 8
