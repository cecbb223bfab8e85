"""Anchor-RPN stack tests: anchors, matcher, sampler, coders, end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.config import SwinConfig, TrainConfig
from nerf_mae_tpu.ops.anchors import (
    anchor_padding_mask,
    balanced_sample,
    base_anchors_for_level,
    grid_anchors,
    match_anchors,
)
from nerf_mae_tpu.ops.coders import (
    decode_aabb_deltas,
    decode_midpoint_offset,
    encode_aabb_deltas,
    encode_midpoint_offset,
)
from nerf_mae_tpu.ops.obb import obb2hbb_3d, obb2poly, rectpoly2obb, regular_obb
from nerf_mae_tpu.models.rpn import RPNConfig


class TestAnchors:
    def test_base_anchor_permutations(self):
        base = base_anchors_for_level((8.0,), ((1, 1, 1), (1, 1, 2)))
        # (1,1,1) -> 1 perm; (1,1,2) -> 3 perms = 4 anchors
        assert base.shape == (4, 6)
        sizes = base[:, 3:] - base[:, :3]
        assert sorted(sizes[:, 0].tolist()) == [8, 8, 8, 16]

    def test_grid_anchor_counts(self):
        anchors, centers, levels, per_level = grid_anchors(
            32, (8, 16, 32), ((8.0,), (16.0,), (32.0,)), ((1, 1, 1),)
        )
        assert per_level == [64, 8, 1]
        assert anchors.shape == (73, 6)
        # first anchor of level 0 is centered at origin
        np.testing.assert_array_equal(centers[0], [0, 0, 0])
        np.testing.assert_array_equal(anchors[0], [-4, -4, -4, 4, 4, 4])

    def test_padding_mask(self):
        _, centers, _, _ = grid_anchors(32, (16,), ((16.0,),), ((1, 1, 1),))
        sizes = jnp.array([[32, 32, 32], [10, 32, 32]])
        m = np.asarray(anchor_padding_mask(jnp.asarray(centers), sizes))
        assert m[0].all()
        # second scene: cells at x=16 invalid (16 >= 10)
        assert m[1].sum() == 4


class TestMatcher:
    def test_thresholds(self):
        quality = jnp.array([[0.5, 0.25, 0.1, 0.0]])
        labels, matched = match_anchors(
            quality, jnp.array([True]), jnp.ones(4, bool), 0.2, 0.35,
            allow_low_quality=False,
        )
        np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0, 0])

    def test_low_quality_restore(self):
        # gt's best anchor has IoU 0.3 (< high): restored to positive
        quality = jnp.array([[0.3, 0.1, 0.05, 0.0]])
        labels, _ = match_anchors(
            quality, jnp.array([True]), jnp.ones(4, bool), 0.2, 0.35,
        )
        assert np.asarray(labels)[0] == 1

    def test_invalid_gt_and_anchor(self):
        quality = jnp.array([[0.9, 0.9, 0.9, 0.9], [0.1, 0.1, 0.1, 0.1]])
        labels, matched = match_anchors(
            quality, jnp.array([False, True]),
            jnp.array([True, True, True, False]), 0.2, 0.35,
        )
        lab = np.asarray(labels)
        assert lab[3] == -1  # padded anchor ignored
        # gt 0 invalid: its 0.9 qualities don't count; gt 1 restores its best
        assert (np.asarray(matched)[lab == 1] == 1).all()

    def test_balanced_sampler(self):
        labels = jnp.array([1.0] * 10 + [0.0] * 100 + [-1.0] * 20)
        pos, neg = balanced_sample(jax.random.PRNGKey(0), labels, 32, 0.5)
        assert int(pos.sum()) == 10  # all positives (< 16 cap)
        assert int(neg.sum()) == 22  # fill to 32
        assert not np.asarray(pos)[110:].any() and not np.asarray(neg)[110:].any()

    def test_sampler_caps_positives(self):
        labels = jnp.array([1.0] * 50 + [0.0] * 50)
        pos, neg = balanced_sample(jax.random.PRNGKey(1), labels, 32, 0.5)
        assert int(pos.sum()) == 16 and int(neg.sum()) == 16


class TestCoders:
    def test_aabb_roundtrip(self):
        rs = np.random.RandomState(0)
        anchors = jnp.asarray(
            np.concatenate([rs.rand(8, 3) * 10, rs.rand(8, 3) * 10 + 12], 1).astype(np.float32)
        )
        gt = jnp.asarray(
            np.concatenate([rs.rand(8, 3) * 10, rs.rand(8, 3) * 10 + 13], 1).astype(np.float32)
        )
        deltas = encode_aabb_deltas(gt, anchors)
        back = decode_aabb_deltas(deltas, anchors)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("theta", [0.0, 0.4, -0.9])
    def test_midpoint_offset_roundtrip(self, theta):
        gt = jnp.array([[20.0, 22.0, 18.0, 10.0, 6.0, 8.0, theta]])
        anchors = jnp.array([[14.0, 16.0, 12.0, 28.0, 30.0, 26.0]])
        deltas = encode_midpoint_offset(gt, anchors)
        back = np.asarray(decode_midpoint_offset(deltas, anchors))[0]
        want = np.asarray(gt)[0]
        np.testing.assert_allclose(back[:3], want[:3], atol=1e-2)
        np.testing.assert_allclose(back[5], want[5], atol=1e-2)
        np.testing.assert_allclose(
            sorted(back[3:5].tolist()), sorted(want[3:5].tolist()), atol=0.05
        )
        d = abs(back[6] - want[6]) % (np.pi / 2)
        assert min(d, np.pi / 2 - d) < 0.03

    def test_obb2hbb_3d(self):
        obb = jnp.array([[0.0, 0.0, 5.0, 2.0, 2.0, 4.0, np.pi / 4]])
        hbb = np.asarray(obb2hbb_3d(obb))[0]
        r = np.sqrt(2)
        np.testing.assert_allclose(hbb, [-r, -r, 3, r, r, 7], atol=1e-5)

    def test_rectpoly2obb_roundtrip(self):
        obb = jnp.array([[3.0, 4.0, 6.0, 2.0, 0.3]])
        poly = obb2poly(obb)
        back = np.asarray(rectpoly2obb(poly))[0]
        want = np.asarray(regular_obb(obb))[0]
        np.testing.assert_allclose(back, want, atol=1e-4)


class TestRPNEndToEnd:
    def make_trainer(self, rotated=False, reg_loss="smooth_l1"):
        from nerf_mae_tpu.parallel import make_mesh
        from nerf_mae_tpu.train.rpn_trainer import RPNTrainer

        swin = SwinConfig(embed_dim=12, depths=(1, 1, 1, 1),
                          num_heads=(3, 6, 12, 24), stochastic_depth_prob=0.0)
        rpn = RPNConfig(
            resolution=32, rotated_bbox=rotated, reg_loss_type=reg_loss,
            pre_nms_top_n=64, post_nms_top_n=32, max_gt=8,
            batch_size_per_mesh=64,
        )
        return RPNTrainer(swin, rpn, TrainConfig(batch_size=2), 20,
                          make_mesh(1), compute_dtype="float32", remat=False)

    def det_batch(self, obb=False):
        from nerf_mae_tpu.data.datasets import (
            detection_batch_iterator,
            synthetic_detection_scenes,
        )

        scenes = synthetic_detection_scenes(2, 32, seed=0, min_size=24, obb=obb)

        class _DS:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                return scenes[i]

        return next(detection_batch_iterator(_DS(), 2, 32, max_gt=8,
                                             shuffle=False, loop=False))

    @pytest.mark.parametrize("rotated", [False, True])
    def test_train_decreases(self, rotated):
        trainer = self.make_trainer(rotated)
        state = trainer.init(jax.random.PRNGKey(0))
        batch = self.det_batch(obb=rotated)
        losses = []
        for _ in range(8):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0], losses
        assert float(m["num_pos"]) > 0

    def test_predict_shapes(self):
        trainer = self.make_trainer()
        state = trainer.init(jax.random.PRNGKey(0))
        det = trainer.predict_step(state, self.det_batch())
        assert det["boxes"].shape == (2, 32, 6)
        assert det["scores"].shape == (2, 32)
        s = np.asarray(det["scores"])
        assert (s[:, :-1] >= s[:, 1:]).all()
