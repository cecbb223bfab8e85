"""RCNN second stage tests: ROI align, level mapper, rotated coder, sampling,
end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.models.rcnn import RCNNConfig, RCNNStage, sample_rois
from nerf_mae_tpu.ops.coders import decode_rotated_deltas, encode_rotated_deltas
from nerf_mae_tpu.ops.roi_align import (
    fpn_level_for_boxes,
    roi_align_3d,
    roi_align_rotated_3d,
)


class TestLevelMapper:
    def test_fpn_eqn1(self):
        # canonical: side 160 -> level 4 -> clamped idx 3; side 20 (=160/8)
        # -> level 1
        boxes = jnp.array(
            [[0, 0, 0, 160.0, 160, 160, 0], [0, 0, 0, 20.0, 20, 20, 0]]
        )
        lvl = np.asarray(fpn_level_for_boxes(boxes, canonical_scale=160))
        assert lvl[0] == 3 and lvl[1] == 1

    def test_aabb_input(self):
        boxes = jnp.array([[0, 0, 0, 40.0, 40, 40]])
        assert int(fpn_level_for_boxes(boxes, canonical_scale=160)[0]) == 2


class TestROIAlign:
    def test_constant_field(self):
        # constant feature -> every aligned bin equals the constant
        feats = [jnp.full((8, 8, 8, 3), 2.5), jnp.full((4, 4, 4, 3), 7.0)]
        rois = jnp.array([[12.0, 12.0, 12.0, 8.0, 6.0, 4.0, 0.4]])
        out0 = roi_align_rotated_3d(feats, rois, jnp.array([0]), (4, 8),
                                    output_size=3, enlarge_scale=0.0)
        np.testing.assert_allclose(np.asarray(out0), 2.5, atol=1e-5)
        out1 = roi_align_rotated_3d(feats, rois, jnp.array([1]), (4, 8),
                                    output_size=3, enlarge_scale=0.0)
        np.testing.assert_allclose(np.asarray(out1), 7.0, atol=1e-5)

    def test_linear_field_alignment(self):
        # feature = x coordinate (in voxels / stride 1): aligned samples of an
        # axis-aligned roi must reproduce the lattice x positions
        w = 16
        xs = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[:, None, None, None], (w, w, w, 1)
        )
        rois = jnp.array([[8.0, 8.0, 8.0, 6.0, 6.0, 6.0, 0.0]])
        out = roi_align_rotated_3d([xs], rois, jnp.array([0]), (1,),
                                   output_size=3, enlarge_scale=0.0)
        got = np.asarray(out)[0, :, 0, 0, 0]
        want = 8.0 + (np.array([0.5, 1.5, 2.5]) / 3 - 0.5) * 6.0
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rotation_90deg(self):
        # rotating the roi by 90deg swaps which axis the samples walk along
        w = 16
        xs = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[:, None, None, None], (w, w, w, 1)
        )
        rois = jnp.array([[8.0, 8.0, 8.0, 6.0, 6.0, 6.0, np.pi / 2]])
        out = np.asarray(
            roi_align_rotated_3d([xs], rois, jnp.array([0]), (1,),
                                 output_size=3, enlarge_scale=0.0)
        )[0]
        # x coordinate now varies along the roi's SECOND axis
        assert np.ptp(out[:, 0, 0, 0]) < 1e-4
        assert np.ptp(out[0, :, 0, 0]) > 1.0

    def test_out_of_range_zero(self):
        feats = [jnp.ones((4, 4, 4, 1))]
        rois = jnp.array([[100.0, 100.0, 100.0, 4.0, 4.0, 4.0, 0.0]])
        out = roi_align_rotated_3d(feats, rois, jnp.array([0]), (1,),
                                   output_size=2)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_aabb_wrapper(self):
        feats = [jnp.full((8, 8, 8, 2), 3.0)]
        rois = jnp.array([[4.0, 4.0, 4.0, 20.0, 20.0, 20.0]])
        out = roi_align_3d(feats, rois, jnp.array([0]), (4,), output_size=2,
                           enlarge_scale=0.0)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


class TestRotatedCoder:
    @pytest.mark.parametrize("theta", [0.0, 0.5, -1.1])
    def test_roundtrip(self, theta):
        gt = jnp.array([[20.0, 24.0, 16.0, 8.0, 5.0, 7.0, 0.9]])
        rois = jnp.array([[18.0, 22.0, 15.0, 10.0, 6.0, 8.0, theta]])
        d = encode_rotated_deltas(gt, rois)
        back = decode_rotated_deltas(d, rois)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-4)


class TestSampling:
    def test_fg_bg_split(self):
        cfg = RCNNConfig(rois_per_scene=8, fg_threshold=0.5, bg_threshold=0.2)
        gt = jnp.array([[0.0, 0, 0, 10, 10, 10]])
        gv = jnp.ones(1, bool)
        # proposals (AABB): 2 perfect, 2 far, 1 mid-iou (ignored), 1 invalid
        props = jnp.array([
            [0, 0, 0, 10, 10, 10],
            [0, 0, 0, 10, 10, 10],
            [45, 45, 45, 55, 55, 55],
            [55, 55, 55, 65, 65, 65],
            [3, 3, 3, 13, 13, 13],
            [0, 0, 0, 10, 10, 10],
        ], jnp.float32)
        pv = jnp.array([True, True, True, True, True, False])
        sel, labels, matched, sel_valid = sample_rois(
            jax.random.PRNGKey(0), cfg, props, pv, gt, gv
        )
        labels = np.asarray(labels)
        sel_valid = np.asarray(sel_valid)
        assert labels[sel_valid].sum() == 2  # both perfect fg, invalid excluded
        assert sel_valid.sum() == 4  # 2 fg + 2 bg (mid-iou ignored)


class TestRCNNEndToEnd:
    def test_train_and_eval(self):
        cfg = RCNNConfig(
            resolution=32, strides=(4, 8), rois_per_scene=8, output_size=3,
        )
        model = RCNNStage(cfg)
        rs = np.random.RandomState(0)
        feats = [
            jnp.asarray(rs.rand(2, 8, 8, 8, 16).astype(np.float32)),
            jnp.asarray(rs.rand(2, 4, 4, 4, 16).astype(np.float32)),
        ]
        lo = rs.rand(2, 12, 3).astype(np.float32) * 20 + 2
        props = jnp.asarray(
            np.concatenate([lo, lo + rs.rand(2, 12, 3).astype(np.float32) * 8 + 2],
                           axis=-1)
        )
        pv = jnp.ones((2, 12), bool)
        gt = jnp.asarray(
            np.concatenate([rs.rand(2, 3, 3) * 10, rs.rand(2, 3, 3) * 10 + 14],
                           axis=-1).astype(np.float32)
        )
        gv = jnp.ones((2, 3), bool)
        rng = jax.random.PRNGKey(0)
        params = model.init(
            {"params": rng}, feats, props, pv, gt, gv, rng, True
        )["params"]

        import optax

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, rng):
            def loss_fn(p):
                return model.apply({"params": p}, feats, props, pv, gt, gv,
                                   rng, True)

            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt2 = tx.update(g, opt)
            return optax.apply_updates(params, up), opt2, l

        losses = []
        for i in range(6):
            params, opt, l = step(params, opt, jax.random.fold_in(rng, i))
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        det = model.apply({"params": params}, feats, props, pv)
        assert det["boxes"].shape == (2, 12, 6)
        assert det["scores"].shape == (2, 12)
