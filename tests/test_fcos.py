"""FCOS detection stack tests: coders, target assignment, loss, postprocess,
eval metrics, end-to-end training signal on a tiny detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.config import SwinConfig, TrainConfig
from nerf_mae_tpu.data.datasets import (
    detection_batch_iterator,
    synthetic_detection_scenes,
)
from nerf_mae_tpu.eval.detection import (
    detection_eval_summary,
    proposal_average_precision,
    proposal_recall,
)
from nerf_mae_tpu.models.fcos import FCOSConfig
from nerf_mae_tpu.ops.fcos_box import (
    decode_fcos_aabb,
    decode_fcos_obb,
    encode_fcos_aabb,
    encode_fcos_obb,
    obb_footprint_aabb,
)
from nerf_mae_tpu.ops.fcos_targets import (
    assign_fcos_targets,
    centerness_targets,
    level_locations,
)


class TestCoders:
    def test_aabb_roundtrip(self):
        locs = jnp.array([[5.0, 5.0, 5.0], [8.0, 2.0, 9.0]])
        boxes = jnp.array([[2.0, 1.0, 3.0, 9.0, 8.0, 7.0]] * 2)
        off = encode_fcos_aabb(locs, boxes)
        back = decode_fcos_aabb(locs, off)
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-5)

    @pytest.mark.parametrize("theta", [0.0, 0.3, -0.7, 1.2])
    def test_obb_roundtrip(self, theta):
        # encode then decode must recover the OBB (up to theta symmetry)
        box = jnp.array([[20.0, 24.0, 16.0, 8.0, 12.0, 6.0, theta]])
        loc = jnp.array([[20.0, 24.0, 16.0]])
        off = encode_fcos_obb(loc, box)
        back = np.asarray(decode_fcos_obb(loc, off))[0]
        want = np.asarray(box)[0]
        np.testing.assert_allclose(back[:3], want[:3], atol=1e-3)
        np.testing.assert_allclose(back[5], want[5], atol=1e-3)
        # footprint must match: compare rotated rectangles via area + corners
        got_wl = sorted(back[3:5].tolist())
        want_wl = sorted(want[3:5].tolist())
        np.testing.assert_allclose(got_wl, want_wl, atol=0.05)
        # angle equal mod pi/2 symmetry of the w/l swap
        d = abs(back[6] - want[6]) % (np.pi / 2)
        assert min(d, np.pi / 2 - d) < 0.02

    def test_footprint_aabb(self):
        box = jnp.array([[0.0, 0.0, 5.0, 2.0, 2.0, 4.0, np.pi / 4]])
        aabb = np.asarray(obb_footprint_aabb(box))[0]
        r = np.sqrt(2.0)
        np.testing.assert_allclose(aabb, [-r, -r, 3, r, r, 7], atol=1e-5)


class TestTargets:
    def setup_method(self):
        self.per_level, locs, strides, ranges = level_locations((32, 32, 32), (4, 8, 16, 32))
        self.locs = jnp.asarray(locs)
        self.strides = jnp.asarray(strides)
        self.ranges = jnp.asarray(ranges)

    def test_level_locations_geometry(self):
        assert self.per_level[0].shape == (512, 3)  # 8^3 at stride 4
        assert self.per_level[-1].shape == (1, 3)
        np.testing.assert_array_equal(self.per_level[0][0], [2, 2, 2])
        np.testing.assert_array_equal(self.per_level[1][0], [4, 4, 4])

    def test_small_box_assigned_to_low_level(self):
        # a 8^3 box: max offset <= 16 -> only level 0 locations get label 1
        gt = jnp.array([[[8.0, 8.0, 8.0, 16.0, 16.0, 16.0]]])
        valid = jnp.ones((1, 1), bool)
        labels, reg = assign_fcos_targets(
            self.locs, self.strides, self.ranges, gt, valid, 1.5, False
        )
        labels = np.asarray(labels)[0]
        n0 = self.per_level[0].shape[0]
        assert labels[:n0].sum() > 0
        assert labels[n0:].sum() == 0
        # positive locations: reg targets decode back to the gt box
        pos = np.where(labels[:n0] > 0)[0]
        decoded = decode_fcos_aabb(self.locs[pos], reg[0][pos])
        np.testing.assert_allclose(
            np.asarray(decoded), np.tile([8, 8, 8, 16, 16, 16], (len(pos), 1)),
            atol=1e-4,
        )

    def test_invalid_gt_ignored(self):
        gt = jnp.array([[[8.0, 8.0, 8.0, 16.0, 16.0, 16.0]]])
        labels, _ = assign_fcos_targets(
            self.locs, self.strides, self.ranges, gt, jnp.zeros((1, 1), bool),
            1.5, False,
        )
        assert np.asarray(labels).sum() == 0

    def test_min_volume_tiebreak(self):
        # two nested boxes: overlapping locations must go to the smaller one
        gt = jnp.array(
            [[[4.0, 4.0, 4.0, 20.0, 20.0, 20.0], [8.0, 8.0, 8.0, 16.0, 16.0, 16.0]]]
        )
        valid = jnp.ones((1, 2), bool)
        labels, reg = assign_fcos_targets(
            self.locs, self.strides, self.ranges, gt, valid,
            center_sampling_radius=0.0,
        )
        # location (10, 10, 10) is strictly inside both boxes and in level-0
        # range for both -> must match the inner (smaller-volume) box
        idx = np.where((np.asarray(self.locs) == [10, 10, 10]).all(1))[0]
        assert idx.size
        d = decode_fcos_aabb(self.locs[idx[0]], reg[0, idx[0]])
        np.testing.assert_allclose(np.asarray(d), [8, 8, 8, 16, 16, 16], atol=1e-4)

    def test_centerness(self):
        reg = jnp.array([[1.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
        assert float(centerness_targets(reg)[0]) == pytest.approx(1.0)
        reg = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 3.0]])
        want = np.sqrt((1 / 4) * (2 / 2) * (3 / 3))
        assert float(centerness_targets(reg)[0]) == pytest.approx(want, rel=1e-5)


def tiny_detector(use_obb=False, backbone="swin_s"):
    from nerf_mae_tpu.train.det_trainer import DetectionTrainer
    from nerf_mae_tpu.parallel import make_mesh

    swin = SwinConfig(embed_dim=12, depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24),
                      stochastic_depth_prob=0.0)
    fcos = FCOSConfig(
        resolution=32, use_obb=use_obb, pre_nms_top_n=64, post_nms_top_n=32,
        max_gt=8,
    )
    return DetectionTrainer(
        swin, fcos, TrainConfig(batch_size=2), 30, make_mesh(1),
        backbone=backbone, compute_dtype="float32", remat=False,
    )


def det_batch(trainer, n=2, seed=0, obb=False):
    scenes = synthetic_detection_scenes(n, 32, seed=seed, min_size=24, obb=obb)

    class _DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return scenes[i]

    it = detection_batch_iterator(_DS(), n, 32, max_gt=8, shuffle=False, loop=False)
    return next(it)


class TestDetectorEndToEnd:
    @pytest.mark.parametrize("use_obb", [False, True])
    def test_train_step_and_loss_decreases(self, use_obb):
        trainer = tiny_detector(use_obb)
        state = trainer.init(jax.random.PRNGKey(0))
        batch = det_batch(trainer, obb=use_obb)
        losses = []
        for _ in range(8):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0], losses
        assert float(m["num_pos"]) > 0

    def test_predict_shapes_and_validity(self):
        trainer = tiny_detector()
        state = trainer.init(jax.random.PRNGKey(0))
        batch = det_batch(trainer)
        det = trainer.predict_step(state, batch)
        k = trainer.fcos.post_nms_top_n
        assert det["boxes"].shape == (2, k, 7)
        assert det["scores"].shape == (2, k)
        assert det["valid"].shape == (2, k)
        s = np.asarray(det["scores"])
        assert (s[:, :-1] >= s[:, 1:]).all()  # sorted by score

    def test_trunk_grafting(self):
        from nerf_mae_tpu.config import MAEConfig
        from nerf_mae_tpu.models.mae import SwinMAE3D

        trainer = tiny_detector()
        state = trainer.init(jax.random.PRNGKey(0))
        mae = SwinMAE3D(
            MAEConfig(swin=trainer.swin, resolution=32, compute_dtype="float32",
                      remat=False)
        )
        rng = jax.random.PRNGKey(5)
        mae_params = mae.init(
            {"params": rng, "mask": rng}, jnp.zeros((1, 32, 32, 32, 4)), True
        )["params"]
        grafted = trainer.graft_mae_trunk(state, mae_params)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(grafted.params["body"]["encoder"])[0]),
            np.asarray(jax.tree.leaves(mae_params["encoder"])[0]),
        )
        # head params untouched
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(grafted.params["head"])[0]),
            np.asarray(jax.tree.leaves(state.params["head"])[0]),
        )

    @pytest.mark.parametrize("backbone", ["resnet", "vgg_AF"])
    def test_alt_backbones(self, backbone):
        trainer = tiny_detector(backbone=backbone)
        state = trainer.init(jax.random.PRNGKey(0))
        batch = det_batch(trainer)
        state, m = trainer.train_step(state, batch)
        assert np.isfinite(float(m["loss"]))


class TestDetectionEval:
    def test_perfect_proposals(self):
        gts = [np.array([[0, 0, 0, 10, 10, 10], [20, 20, 20, 28, 29, 30]], np.float32)]
        props = [gts[0].copy()]
        scores = [np.array([0.9, 0.8], np.float32)]
        r = proposal_recall(props, scores, gts)
        assert r["ar"] == pytest.approx(1.0)
        ap = proposal_average_precision(props, scores, gts, iou_thresh=0.5)
        assert ap["ap"] == pytest.approx(1.0)

    def test_ap_with_false_positives(self):
        gts = [np.array([[0, 0, 0, 10, 10, 10]], np.float32)]
        props = [np.array([[50, 50, 50, 60, 60, 60], [0, 0, 0, 10, 10, 10]], np.float32)]
        # false positive ranked first
        scores = [np.array([0.9, 0.8], np.float32)]
        ap = proposal_average_precision(props, scores, gts, iou_thresh=0.5)
        assert ap["ap"] == pytest.approx(0.5)
        # true positive ranked first
        scores = [np.array([0.5, 0.9], np.float32)]
        ap = proposal_average_precision(props, scores, gts, iou_thresh=0.5)
        assert ap["ap"] == pytest.approx(1.0)

    def test_duplicate_detections_penalized(self):
        gts = [np.array([[0, 0, 0, 10, 10, 10]], np.float32)]
        props = [np.array([[0, 0, 0, 10, 10, 10]] * 3, np.float32)]
        scores = [np.array([0.9, 0.8, 0.7], np.float32)]
        ap = proposal_average_precision(props, scores, gts, iou_thresh=0.5)
        assert ap["ap"] == pytest.approx(1.0)  # VOC: later dups are FPs after recall 1

    def test_summary_keys(self):
        gts = [np.array([[0, 0, 0, 10, 10, 10]], np.float32)]
        props = [gts[0].copy()]
        scores = [np.array([0.9], np.float32)]
        out = detection_eval_summary(props, scores, gts, top_n=(300,))
        assert set(out) == {
            "recall25_top300", "recall50_top300", "ar_top300",
            "ap25", "ap50", "ap75",
        }
        assert out["ap50"] == 1.0


# mid tier: ~70 s (pays a DetectionTrainer compile; VERDICT r3 weak #4)
def test_bbox_pred_bias_init_breaks_zero_volume_plateau():
    """The relu(norm_reg_targets) head must NOT start at zero-volume boxes:
    the +1-smoothed IoU loss has a flat spot there (d inter/d pred is a
    product of two ~zero extents) that froze reg at -log(1/2) in low-data
    runs. Distance channels start at 0.5; OBB midpoint channels at 0."""
    import numpy as np

    from nerf_mae_tpu.config import SWIN_PRESETS, TrainConfig
    from nerf_mae_tpu.parallel import make_mesh
    from nerf_mae_tpu.train.det_trainer import DetectionTrainer

    mesh = make_mesh()
    tr = DetectionTrainer(
        SWIN_PRESETS["swin_nano"], FCOSConfig(resolution=32, use_obb=True),
        TrainConfig(batch_size=2), 10, mesh, backbone="swin_nano",
        compute_dtype="float32", remat=False,
    )
    state = tr.init(jax.random.PRNGKey(0))
    bias = np.asarray(state.params["head"]["bbox_pred"]["bias"])
    np.testing.assert_array_equal(bias[:6], 0.5)
    np.testing.assert_array_equal(bias[6:], 0.0)


# mid tier: shares the DetectionTrainer compile cost with the test above
def test_reference_init_flag_reproduces_zero_bias():
    """FCOSConfig(reference_init=True) reproduces the reference's zero
    reg-bias start (ref fcos/fcos.py:121-135) for exact-parity runs."""
    import numpy as np

    from nerf_mae_tpu.config import SWIN_PRESETS, TrainConfig
    from nerf_mae_tpu.parallel import make_mesh
    from nerf_mae_tpu.train.det_trainer import DetectionTrainer

    mesh = make_mesh()
    tr = DetectionTrainer(
        SWIN_PRESETS["swin_nano"],
        FCOSConfig(resolution=32, use_obb=True, reference_init=True),
        TrainConfig(batch_size=2), 10, mesh, backbone="swin_nano",
        compute_dtype="float32", remat=False,
    )
    state = tr.init(jax.random.PRNGKey(0))
    bias = np.asarray(state.params["head"]["bbox_pred"]["bias"])
    np.testing.assert_array_equal(bias, 0.0)


@pytest.mark.quick
def test_synthetic_hard_scenes_are_discriminative():
    """hard=True must produce the low-data e2e distribution: varied box
    extents (not a single size — that made the normalized IoU-loss target
    volume a constant), unlabeled clutter (occupied voxels outside every
    GT box), and background alpha noise."""
    scenes = synthetic_detection_scenes(4, 32, seed=3, hard=True)
    edges = np.concatenate(
        [s["boxes"][:, 3:] - s["boxes"][:, :3] for s in scenes]
    ).ravel()
    assert len(np.unique(edges)) >= 2, np.unique(edges)
    s = scenes[0]
    inside = np.zeros(s["rgbsigma"].shape[:3], bool)
    for b in s["boxes"].astype(int):
        inside[b[0]:b[3], b[1]:b[4], b[2]:b[5]] = True
    occupied = s["rgbsigma"][..., 3] > 0.25
    # slabs + debris are occupied but not annotated
    assert (occupied & ~inside).sum() > occupied.sum() * 0.3
    # background noise floor present, alpha clipped to [0, 1]
    assert (s["rgbsigma"][..., 3] > 0).mean() > 0.9
    assert s["rgbsigma"][..., 3].max() <= 1.0
