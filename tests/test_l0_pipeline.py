"""One-command L0 data-production integration test (slow tier).

Chains the real pipeline with no manual glue, the reference's offline flow
(reference: data/hm3d/save_transforms_with_boxes.py -> instant-ngp grid
extraction -> data/hm3d/preprocess_boxes.py -> nerf_rpn/datasets.py:88-101):

  raw poses + world boxes
    -> scripts/save_transforms.py      (PCA pose normalization, box carry,
                                        room_bbox + ngp scale/offset)
    -> render tiny views of an analytic scene at the *output* poses
    -> scripts/run_nerf.py --task train_extract --ngp_frame   (tiny NeRF,
                                        rgbsigma npz with ngp metadata)
    -> scripts/preprocess_boxes.py     (world OBBs -> voxel [N, 7])
    -> SceneDataset + detection_batch_iterator
    -> one DetectionTrainer train step (finite loss, positives matched)

Each stage is unit-tested elsewhere; this test pins that the *files* they
exchange actually compose, and that the voxel boxes land on the extracted
density (centroid check per object).
"""

import json
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from nerf_mae_tpu.config import SwinConfig, TrainConfig  # noqa: E402
from nerf_mae_tpu.models.fcos import FCOSConfig  # noqa: E402
from nerf_mae_tpu.data.datasets import (  # noqa: E402
    SceneDataset,
    detection_batch_iterator,
)
from nerf_mae_tpu.nerf.render import get_rays, render_rays  # noqa: E402
from nerf_mae_tpu.parallel import make_mesh  # noqa: E402


def look_at(eye, target, up=(0, 0, 1)):
    eye = np.asarray(eye, np.float64)
    f = eye - np.asarray(target, np.float64)
    f /= np.linalg.norm(f)
    r = np.cross(np.asarray(up, np.float64), f)
    r /= np.linalg.norm(r)
    u = np.cross(f, r)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, f, eye
    return c2w


def test_l0_pipeline_composes(tmp_path):
    from PIL import Image

    from preprocess_boxes import main as preprocess_boxes_main
    from run_nerf import main as run_nerf_main
    from save_transforms import main as save_transforms_main

    # --- stage 0: raw scene — two boxes on a "floor", orbiting cameras ----
    objs = [  # (position, extents) in raw world coords, z-up
        (np.array([9.0, -3.8, 0.8]), np.array([1.6, 1.6, 1.4])),
        (np.array([12.0, -2.2, 0.7]), np.array([1.4, 1.4, 1.2])),
    ]
    mid = (objs[0][0] + objs[1][0]) / 2
    rng = np.random.RandomState(0)
    t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    # orbit close enough that the objects dominate the frames — a tiny
    # NeRF on small images falls into the all-empty local optimum when the
    # foreground covers only a few pixels
    eyes = np.stack([
        mid[0] + 3.8 * np.cos(t), mid[1] + 3.8 * np.sin(t),
        2.2 + 0.15 * rng.randn(16),
    ], axis=1)
    poses = np.stack([look_at(e, mid) for e in eyes])

    scene = tmp_path / "scene0"
    (scene / "poses").mkdir(parents=True)
    for i, p in enumerate(poses):
        with open(scene / "poses" / f"{i}.json", "w") as f:
            json.dump({"pose": p.tolist()}, f)
    items = []
    for pos, ext in objs:  # HM3D json is y-up: swap y/z
        lo, hi = pos - ext / 2, pos + ext / 2
        items.append({"class_name": "chair",
                      "bbox": [lo[[0, 2, 1]].tolist(), hi[[0, 2, 1]].tolist()]})
    with open(tmp_path / "boxes.json", "w") as f:
        json.dump(items, f)

    # --- stage 1: save_transforms ----------------------------------------
    W = H = 24
    tpath = scene / "transforms.json"
    rc = save_transforms_main([
        "--input_dir", str(scene), "--boxes_json", str(tmp_path / "boxes.json"),
        "--output", str(tpath), "--swap_yz",
        "--width", str(W), "--height", str(H), "--fov_x", "70",
    ])
    assert rc == 0
    with open(tpath) as f:
        tj = json.load(f)
    assert len(tj["bounding_boxes"]) == 2 and "room_bbox" in tj

    # --- stage 2: render views of an analytic stand-in scene at the
    # normalized output poses (solid blobs where the carried boxes say the
    # objects are), so the NeRF has something real to reconstruct ----------
    blobs = [(np.asarray(b["position"]), 0.75 * min(b["extents"]))
             for b in tj["bounding_boxes"]]
    colors = [jnp.array([4.0, -4.0, -4.0]), jnp.array([-4.0, -4.0, 4.0])]

    def field(_params, pts, _vd):
        sigma = jnp.zeros(pts.shape[:-1])
        rgb = jnp.zeros(pts.shape[:-1] + (3,))
        for (c, r), col in zip(blobs, colors):
            inside = jnp.linalg.norm(pts - c, axis=-1) < r
            sigma = jnp.where(inside, 60.0, sigma)
            rgb = jnp.where(inside[..., None], col, rgb)
        return rgb, sigma

    focal = 0.5 * W / np.tan(0.5 * tj["camera_angle_x"])
    out_poses = np.asarray([fr["transform_matrix"] for fr in tj["frames"]])
    cam_d = np.linalg.norm(
        out_poses[:, :3, 3] - np.asarray(blobs[0][0]), axis=1)
    # keep [near, far] tight: with 32 stratified samples a loose far
    # spreads samples so thin the blobs get ~1 hit per ray and the NeRF
    # collapses to the empty-scene optimum (measured: far=2.5x -> PSNR
    # 10.9, no density; far=1.8x -> PSNR 24.1, boxes on density)
    near, far = 0.05, float(cam_d.max() * 1.8)
    var = []
    for fr, p in zip(tj["frames"], out_poses):
        o, d = get_rays(jnp.asarray(p), H, W, focal)
        out = render_rays(None, field, o.reshape(-1, 3), d.reshape(-1, 3),
                          near, far, 64)
        img = np.asarray(out["rgb"]).reshape(H, W, 3)
        var.append(img.std())
        path = scene / fr["file_path"]
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
    assert max(var) > 0.05, "objects not visible from the output poses"

    # --- stage 3: tiny NeRF train + ngp-frame grid extraction -------------
    feat_dir = tmp_path / "features"
    run_nerf_main([
        "--task", "train_extract", "--scene_dir", str(scene),
        "--scene_id", "scene0", "--extract_dir", str(feat_dir),
        "--ngp_frame", "--steps", "250", "--lr", "5e-4",
        "--ray_batch", "256",
        "--n_samples", "32", "--n_importance", "0", "--max_res", "16",
        "--near", str(near), "--far", str(far), "--platform", "cpu",
    ])
    npz = np.load(feat_dir / "scene0.npz")
    assert {"rgbsigma", "resolution", "bbox_min", "bbox_max", "scale",
            "offset"} <= set(npz.files)
    g = npz["rgbsigma"]
    assert g.ndim == 4 and g.shape[-1] == 4
    assert list(g.shape[:3]) == list(npz["resolution"])

    # --- stage 4: preprocess_boxes (world OBB json -> voxel [N, 7]) -------
    boxes_dir = tmp_path / "boxes"
    boxes_dir.mkdir()
    preprocess_boxes_main([
        "--annotations", str(tpath),
        "--features_npz", str(feat_dir / "scene0.npz"),
        "--output", str(boxes_dir / "scene0.npy"), "--format", "obb",
    ])
    vb = np.load(boxes_dir / "scene0.npy")
    assert vb.shape == (2, 7)
    res = np.asarray(npz["resolution"], np.float64)
    assert (vb[:, :3] >= 0).all() and (vb[:, :3] <= res).all()

    # voxel boxes must sit on the extracted density: per-object centroid of
    # the strongest-density voxels nearest that object. rgbsigma stores RAW
    # sigma (reference contract, extract.py): density is relu(sigma), so
    # positives are the occupied set
    sig = np.maximum(g[..., 3], 0.0)
    assert sig.max() > 0, "NeRF reconstructed no positive density at all"
    thresh = sig.max() * 0.5
    occ = np.stack(np.nonzero(sig > thresh), axis=1) + 0.5
    assert len(occ), "NeRF reconstructed no density above threshold"
    for bi in range(2):
        d = np.linalg.norm(occ - vb[bi, :3], axis=1)
        near_occ = occ[d < max(3.0, 0.75 * vb[bi, 3:6].max())]
        assert len(near_occ), f"no density near voxel box {bi}"
        np.testing.assert_allclose(
            near_occ.mean(0), vb[bi, :3], atol=2.5,
            err_msg=f"voxel box {bi} off the density centroid")

    # --- stage 5: SceneDataset -> batch -> one detection train step -------
    ds = SceneDataset(str(feat_dir), boxes_path=str(boxes_dir))
    assert len(ds) == 1
    item = ds[0]
    assert item["rgbsigma"].shape[-1] == 4 and item["boxes"].shape == (2, 7)

    from nerf_mae_tpu.train.det_trainer import DetectionTrainer

    res16 = int(max(npz["resolution"]))
    swin = SwinConfig(embed_dim=12, depths=(1, 1, 1, 1),
                      num_heads=(3, 6, 12, 24), stochastic_depth_prob=0.0)
    fcos = FCOSConfig(resolution=res16, use_obb=True, pre_nms_top_n=32,
                      post_nms_top_n=16, max_gt=4)
    trainer = DetectionTrainer(swin, fcos, TrainConfig(batch_size=1), 10,
                               make_mesh(1), backbone="swin_s",
                               compute_dtype="float32", remat=False)
    it = detection_batch_iterator(ds, 1, res16, max_gt=4, shuffle=False,
                                  loop=False)
    batch = next(it)
    state = trainer.init(jax.random.PRNGKey(0))
    state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"])), m
    assert float(m["num_pos"]) > 0, "no FCOS positives matched the gt boxes"
