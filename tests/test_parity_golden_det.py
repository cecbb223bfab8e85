"""Golden parity for the detection math, pinned against the *actual*
reference PyTorch implementations.

tests/fixtures/golden_det.npz holds seeded random inputs and the reference's
outputs for rotated IoU/GIoU/DIoU, pairwise IoU matrices, greedy NMS,
the torchvision-style Matcher, all three box coders, the Detectron/VOC eval
suite, and FCOS target assignment (generated offline by
scripts/make_golden_det_fixtures.py from /root/reference/nerf_rpn). These
tests pin our JAX/numpy counterparts to those recorded values.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_det.npz")


@pytest.fixture(scope="module")
def fx():
    return dict(np.load(FIX))


# ---- rotated IoU family ---------------------------------------------------


def test_rotated_iou_matches_reference(fx):
    from nerf_mae_tpu.ops.rotated_iou import iou_3d

    got = np.asarray(iou_3d(fx["iou_b1"], fx["iou_b2"]))
    np.testing.assert_allclose(got, fx["iou"], rtol=1e-4, atol=1e-5)


def test_rotated_giou_loss_matches_reference(fx):
    from nerf_mae_tpu.ops.rotated_iou import giou_3d_loss

    got = np.asarray(giou_3d_loss(fx["iou_b1"], fx["iou_b2"], "smallest"))
    np.testing.assert_allclose(got, fx["giou_loss"], rtol=1e-4, atol=1e-4)
    got_al = np.asarray(giou_3d_loss(fx["iou_b1"], fx["iou_b2"], "aligned"))
    np.testing.assert_allclose(
        got_al, fx["giou_loss_aligned"], rtol=1e-4, atol=1e-5)


def test_rotated_diou_loss_matches_reference(fx):
    from nerf_mae_tpu.ops.rotated_iou import diou_3d_loss

    got = np.asarray(diou_3d_loss(fx["iou_b1"], fx["iou_b2"], "smallest"))
    np.testing.assert_allclose(got, fx["diou_loss"], rtol=1e-4, atol=1e-4)


def test_pairwise_iou_matrices_match_reference(fx):
    from nerf_mae_tpu.ops.boxes import box_iou_aabb
    from nerf_mae_tpu.ops.rotated_iou import box_iou_obb_pairwise

    got = np.asarray(box_iou_aabb(fx["aabb_m1"], fx["aabb_m2"]))
    np.testing.assert_allclose(got, fx["aabb_iou_matrix"], rtol=1e-5,
                               atol=1e-6)
    got = np.asarray(box_iou_obb_pairwise(fx["obb_m1"], fx["obb_m2"]))
    np.testing.assert_allclose(got, fx["obb_iou_matrix"], rtol=1e-4,
                               atol=1e-5)


# ---- greedy NMS -----------------------------------------------------------


@pytest.mark.parametrize("th", [25, 50])
def test_nms_matches_reference(fx, th):
    from nerf_mae_tpu.ops.nms import nms_mask

    keep = np.asarray(nms_mask(fx["nms_boxes"], fx["nms_scores"], th / 100))
    ours = np.nonzero(keep)[0]
    ours = ours[np.argsort(-fx["nms_scores"][ours])]  # pick order
    np.testing.assert_array_equal(ours, fx[f"nms_keep_{th}"])


# ---- Matcher ---------------------------------------------------------------


@pytest.mark.parametrize(
    "tag,hi,lo,lq", [("rpn", 0.35, 0.2, True), ("strict", 0.7, 0.3, False)]
)
def test_matcher_matches_reference(fx, tag, hi, lo, lq):
    from nerf_mae_tpu.ops.anchors import match_anchors

    q = fx["match_quality"]
    g, a = q.shape
    labels, best_gt = match_anchors(
        q, np.ones(g, bool), np.ones(a, bool), lo, hi, allow_low_quality=lq)
    labels, best_gt = np.asarray(labels), np.asarray(best_gt)
    ref = fx[f"match_{tag}"]  # gt index, or -1 below-low / -2 between
    ref_labels = np.where(ref >= 0, 1.0, np.where(ref == -1, 0.0, -1.0))
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(best_gt[ref >= 0], ref[ref >= 0])


# ---- box coders ------------------------------------------------------------


def test_aabb_coder_matches_reference(fx):
    from nerf_mae_tpu.ops.coders import decode_aabb_deltas, encode_aabb_deltas

    got = np.asarray(encode_aabb_deltas(fx["coder_gts"], fx["coder_anchors"]))
    np.testing.assert_allclose(got, fx["aabb_deltas"], rtol=1e-5, atol=1e-6)
    got = np.asarray(
        decode_aabb_deltas(fx["coder_rand_deltas"], fx["coder_anchors"]))
    np.testing.assert_allclose(got, fx["aabb_decoded"], rtol=1e-5, atol=1e-5)


def test_rotated_coder_matches_reference(fx):
    from nerf_mae_tpu.ops.coders import (decode_rotated_deltas,
                                         encode_rotated_deltas)

    got = np.asarray(encode_rotated_deltas(fx["coder_gt7"], fx["coder_rois7"]))
    np.testing.assert_allclose(got, fx["rot_deltas"], rtol=1e-4, atol=1e-5)
    got = np.asarray(
        decode_rotated_deltas(fx["coder_rand_deltas7"], fx["coder_rois7"]))
    np.testing.assert_allclose(got, fx["rot_decoded"], rtol=1e-4, atol=1e-4)


def test_midpoint_coder_matches_reference(fx):
    from nerf_mae_tpu.ops.coders import (decode_midpoint_offset,
                                         encode_midpoint_offset)

    got = np.asarray(
        encode_midpoint_offset(fx["coder_gt7"], fx["coder_anchors"]))
    np.testing.assert_allclose(got, fx["mid_deltas"], rtol=1e-4, atol=1e-4)
    got = np.asarray(
        decode_midpoint_offset(fx["coder_rand_deltas8"], fx["coder_anchors"]))
    want = fx["mid_decoded"]
    # centers + sizes match exactly; the angle is only defined mod pi for a
    # rectangle (theta and theta+pi are the same OBB) and rectpoly2obb's
    # near-square w>h branch is a float tie-break, so compare canonically
    np.testing.assert_allclose(got[:, :6], want[:, :6], rtol=1e-4, atol=1e-4)
    d = np.abs(got[:, 6] - want[:, 6]) % np.pi
    assert (np.minimum(d, np.pi - d) < 1e-3).all()


# ---- eval suite ------------------------------------------------------------


def _eval_inputs(fx):
    props = [fx[f"eval_props_{i}"] for i in range(4)]
    scores = [fx[f"eval_scores_{i}"] for i in range(4)]
    gts = [fx[f"eval_gt_{i}"] for i in range(4)]
    return props, scores, gts


def test_proposal_recall_matches_reference(fx):
    from nerf_mae_tpu.eval.detection import proposal_recall

    got = proposal_recall(*_eval_inputs(fx), limit=30)
    np.testing.assert_allclose(got["recalls"], fx["eval_recalls"], atol=1e-6)
    np.testing.assert_allclose(got["ar"], fx["eval_ar"], atol=1e-6)
    assert got["num_pos"] == int(fx["eval_num_pos"])


@pytest.mark.parametrize("th", [25, 50])
def test_proposal_ap_matches_reference(fx, th):
    from nerf_mae_tpu.eval.detection import proposal_average_precision

    got = proposal_average_precision(*_eval_inputs(fx), iou_thresh=th / 100)
    np.testing.assert_allclose(got["ap"], fx[f"eval_ap_{th}"], atol=1e-6)


def test_proposal_precision_matches_reference(fx):
    from nerf_mae_tpu.eval.detection import proposal_precision

    got = proposal_precision(*_eval_inputs(fx), score_thresh=0.5)
    np.testing.assert_allclose(
        got["precisions"], fx["eval_precisions"], atol=1e-6)
    assert got["num_det"] == int(fx["eval_num_det"])


# ---- anchor generation -------------------------------------------------------


def test_grid_anchors_match_reference(fx):
    from nerf_mae_tpu.ops.anchors import grid_anchors

    anchors, _, level_ids, per_level = grid_anchors(32, (4, 8, 16, 32))
    off = 0
    for lv in range(4):
        ours = anchors[off: off + per_level[lv]]
        ref = fx[f"anchors_l{lv}"]
        assert ours.shape == ref.shape
        # the reference's ratio-permutation order comes from an unordered
        # set (anchor.py:59-60); compare as sorted row sets
        key = lambda a: np.lexsort(a.T[::-1])
        np.testing.assert_allclose(
            ours[key(ours)], ref[key(ref)], atol=1e-5,
            err_msg=f"anchors level {lv}")
        off += per_level[lv]


# ---- full FCOS loss -----------------------------------------------------------


@pytest.mark.parametrize("mode,use_obb", [("aabb", False), ("obb", True)])
def test_fcos_full_loss_matches_reference(fx, mode, use_obb):
    from nerf_mae_tpu.models.fcos import FCOSConfig, fcos_loss

    cfg = FCOSConfig(resolution=32, use_obb=use_obb, iou_loss_type="iou",
                     norm_reg_targets=True, center_sampling_radius=1.5)
    logits = [fx[f"floss_{mode}_cls_l{lv}"] for lv in range(4)]
    reg = [fx[f"floss_{mode}_reg_l{lv}"] for lv in range(4)]
    ctr = [fx[f"floss_{mode}_ctr_l{lv}"] for lv in range(4)]
    if use_obb:
        gt0, gt1 = fx["floss_gt_obb_0"], fx["floss_gt_obb_1"]
    else:
        gt0, gt1 = fx["fcos_gt_0"], fx["fcos_gt_1"]
    g, d = max(len(gt0), len(gt1)), gt0.shape[1]
    gt_boxes = np.zeros((2, g, d), np.float32)
    gt_valid = np.zeros((2, g), bool)
    gt_boxes[0, : len(gt0)], gt_valid[0, : len(gt0)] = gt0, True
    gt_boxes[1, : len(gt1)], gt_valid[1, : len(gt1)] = gt1, True

    _, aux = fcos_loss(cfg, logits, reg, ctr, gt_boxes, gt_valid,
                       fx["floss_sizes"])
    np.testing.assert_allclose(
        float(aux["loss_cls"]), fx[f"floss_{mode}_cls"], rtol=2e-4)
    np.testing.assert_allclose(
        float(aux["loss_reg"]), fx[f"floss_{mode}_reg"], rtol=2e-4)
    np.testing.assert_allclose(
        float(aux["loss_centerness"]), fx[f"floss_{mode}_ctr"], rtol=2e-4)


# ---- FCOS post-processing ----------------------------------------------------


@pytest.mark.parametrize("mode,use_obb", [("aabb", False), ("obb", True)])
def test_fcos_postprocess_matches_reference(fx, mode, use_obb):
    from nerf_mae_tpu.models.fcos import FCOSConfig, fcos_postprocess

    cfg = FCOSConfig(
        resolution=32, use_obb=use_obb, norm_reg_targets=True,
        pre_nms_thresh=0.2, pre_nms_top_n=50, nms_thresh=0.3,
        post_nms_top_n=30, min_size=0.0)
    import jax.numpy as jnp

    out = fcos_postprocess(
        cfg,
        [jnp.asarray(fx[f"floss_{mode}_cls_l{lv}"]) for lv in range(4)],
        [jnp.asarray(fx[f"floss_{mode}_reg_l{lv}"]) for lv in range(4)],
        [jnp.asarray(fx[f"floss_{mode}_ctr_l{lv}"]) for lv in range(4)],
        jnp.asarray(fx["floss_sizes"]),
    )
    boxes = np.asarray(out["boxes"])
    scores = np.asarray(out["scores"])
    levels = np.asarray(out["levels"])
    valid = np.asarray(out["valid"])
    for i in range(2):
        want = fx[f"pp_{mode}_boxes_{i}"]  # [K, 1 + 6|7], score-desc
        want_scores = fx[f"pp_{mode}_scores_{i}"]
        n = valid[i].sum()
        assert n == len(want), (n, len(want))
        got_b, got_s, got_l = boxes[i][: n], scores[i][: n], levels[i][: n]
        if not use_obb:  # ours carries (center, size, 0); ref corner AABBs
            got_b = np.concatenate(
                [got_b[:, :3] - got_b[:, 3:6] / 2,
                 got_b[:, :3] + got_b[:, 3:6] / 2], axis=-1)
        else:
            got_b = got_b[:, :7]
        np.testing.assert_allclose(got_s, want_scores, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got_l, want[:, 0])
        np.testing.assert_allclose(got_b, want[:, 1:], rtol=1e-4, atol=1e-4)


# ---- RPN proposal filtering ---------------------------------------------------


def test_rpn_filter_proposals_matches_reference(fx):
    import jax.numpy as jnp

    from nerf_mae_tpu.models.rpn import RPNConfig, rpn_filter_proposals
    from nerf_mae_tpu.ops.anchors import anchor_padding_mask

    anchors = np.concatenate([fx[f"anchors_l{lv}"] for lv in range(4)])
    level_ids = np.concatenate([
        np.full(len(fx[f"anchors_l{lv}"]), lv, np.int32) for lv in range(4)
    ])
    cfg = RPNConfig(resolution=32, pre_nms_top_n=100, post_nms_top_n=30)
    sizes = fx["floss_sizes"]

    # our padding-mask rule (cell center < extent) must reproduce the
    # reference's per-cell ceil rule (anchor.py:124-152); the anchor cell
    # center is (lo + hi) / 2 of a zero-centered base anchor + its shift
    cell_centers = (anchors[:, :3] + anchors[:, 3:]) / 2
    ours_mask = np.asarray(anchor_padding_mask(
        jnp.asarray(cell_centers), jnp.asarray(sizes.astype(np.float32))))
    np.testing.assert_array_equal(ours_mask, fx["rpn_pad_mask"])

    out = rpn_filter_proposals(
        cfg, jnp.asarray(fx["rpn_obj"]), jnp.asarray(fx["rpn_deltas"]),
        jnp.asarray(anchors), level_ids, jnp.asarray(ours_mask),
        jnp.asarray(sizes.astype(np.float32)))
    boxes = np.asarray(out["boxes"])
    scores = np.asarray(out["scores"])
    valid = np.asarray(out["valid"])
    for i in range(2):
        want, want_s = fx[f"rpn_boxes_{i}"], fx[f"rpn_scores_{i}"]
        n = valid[i].sum()
        assert n == len(want), (n, len(want))
        np.testing.assert_allclose(scores[i][:n], want_s, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(boxes[i][:n], want, rtol=1e-4, atol=1e-4)


# ---- metrics -------------------------------------------------------------------


def test_masked_mse_psnr_match_reference(fx):
    from nerf_mae_tpu.metrics import masked_mse, masked_psnr

    got = float(masked_mse(fx["met_pred"], fx["met_gt"], fx["met_mask"]))
    np.testing.assert_allclose(got, fx["met_mse"], rtol=1e-6)
    got = float(masked_psnr(fx["met_pred"], fx["met_gt"], fx["met_mask"]))
    np.testing.assert_allclose(got, fx["met_psnr"], rtol=1e-6)


def test_semantics_losses_match_reference(fx):
    """Weighted/unweighted masked CE (metrics.py:540-553 via the
    CrossEntropyLoss criterion, feature_extractor.py:2562) and the
    soft-mIoU metric (metrics.py:194-252 mIoULoss_new). The fixture uses
    batch 1 with every class present: the reference means the soft IoU over
    all K-1 classes per scene while ours means over classes present in the
    batch — identical when all classes appear."""
    from nerf_mae_tpu.models.heads import voxel_semantics_loss

    lgt, tg = fx["sem_logits"], fx["sem_targets"]
    ce_w, aux = voxel_semantics_loss(lgt, tg, fx["sem_weights"])
    np.testing.assert_allclose(float(ce_w), fx["sem_ce_w"], rtol=1e-5)
    ce_u, aux = voxel_semantics_loss(lgt, tg, None)
    np.testing.assert_allclose(float(ce_u), fx["sem_ce_unw"], rtol=1e-5)
    np.testing.assert_allclose(
        float(aux["soft_miou"]), fx["sem_soft_miou"], rtol=1e-5)


def test_intersection_and_union_matches_reference(fx):
    from nerf_mae_tpu.models.heads import intersection_and_union

    inter, union, tgt = intersection_and_union(
        fx["seg_pred"], fx["seg_tgt"], 19)
    # the reference histograms classes 1..K-1 (class 0 = void is dropped
    # before binning, metrics.py:498-513); ours keeps a class-0 bin
    np.testing.assert_array_equal(inter[1:], fx["seg_inter"])
    np.testing.assert_array_equal(union[1:], fx["seg_union"])
    np.testing.assert_array_equal(tgt[1:], fx["seg_target_area"])


# ---- 2D projection loss --------------------------------------------------------


def test_camera_projection_matches_reference(fx):
    import jax.numpy as jnp

    from nerf_mae_tpu.ops.projection import get_w2cs, project_points

    w2cs = get_w2cs(32)
    np.testing.assert_allclose(w2cs, fx["proj_w2cs"], rtol=1e-5, atol=1e-5)
    for v in range(4):
        pix = np.asarray(project_points(
            jnp.asarray(fx["proj_points"]), jnp.asarray(w2cs[v])))
        np.testing.assert_allclose(pix, fx["proj_pixels"][v], rtol=1e-4,
                                   atol=1e-3)


def test_fcos_proj2d_loss_matches_reference(fx):
    """The projection component of the OBB reg loss matches the reference.

    The reference hardcodes its camera rig and divisor to 160
    (fcos/loss.py:449-470); ours parameterizes by resolution. The fixture
    aligned the rig to 32, so our component equals the reference's
    scaled by 160/32.
    """
    from nerf_mae_tpu.models.fcos import FCOSConfig, fcos_loss

    def reg_at(weight):
        cfg = FCOSConfig(resolution=32, use_obb=True, iou_loss_type="iou",
                         norm_reg_targets=True, proj2d_loss_weight=weight)
        gt0, gt1 = fx["floss_gt_obb_0"], fx["floss_gt_obb_1"]
        g = max(len(gt0), len(gt1))
        gt_boxes = np.zeros((2, g, 7), np.float32)
        gt_valid = np.zeros((2, g), bool)
        gt_boxes[0, : len(gt0)], gt_valid[0, : len(gt0)] = gt0, True
        gt_boxes[1, : len(gt1)], gt_valid[1, : len(gt1)] = gt1, True
        _, aux = fcos_loss(
            cfg,
            [fx[f"floss_obb_cls_l{lv}"] for lv in range(4)],
            [fx[f"floss_obb_reg_l{lv}"] for lv in range(4)],
            [fx[f"floss_obb_ctr_l{lv}"] for lv in range(4)],
            gt_boxes, gt_valid, fx["floss_sizes"])
        return float(aux["loss_reg"])

    ours_comp = reg_at(0.7) - reg_at(0.0)
    ref_comp = float(fx["floss_obb_reg_proj"]) - float(fx["floss_obb_reg"])
    np.testing.assert_allclose(ours_comp, ref_comp * 160.0 / 32.0, rtol=1e-3)


# ---- FCOS target assignment -------------------------------------------------


def test_fcos_targets_match_reference(fx):
    from nerf_mae_tpu.ops.fcos_targets import (assign_fcos_targets,
                                               centerness_targets,
                                               level_locations)

    per_level, locs, strides, ranges = level_locations(
        (32, 32, 32), (4, 8, 16, 32))
    gt0, gt1 = fx["fcos_gt_0"], fx["fcos_gt_1"]
    g = max(len(gt0), len(gt1))
    gt_boxes = np.zeros((2, g, 6), np.float32)
    gt_valid = np.zeros((2, g), bool)
    gt_boxes[0, : len(gt0)], gt_valid[0, : len(gt0)] = gt0, True
    gt_boxes[1, : len(gt1)], gt_valid[1, : len(gt1)] = gt1, True

    labels, reg = assign_fcos_targets(
        locs, strides, ranges, gt_boxes, gt_valid,
        center_sampling_radius=1.5, use_obb=False)
    labels, reg = np.asarray(labels), np.asarray(reg)

    off = 0
    for lv, pl in enumerate(per_level):
        n = len(pl)
        sl = slice(off, off + n)
        np.testing.assert_array_equal(
            labels[:, sl], fx[f"fcos_labels_l{lv}"],
            err_msg=f"labels level {lv}")
        # the reference normalizes reg targets by the level stride
        # (norm_reg_targets, fcos/loss.py:314-316); ours are voxel units.
        # Only positives carry meaning (the reference keeps the
        # smallest-area box's targets at negatives too — so compare all).
        np.testing.assert_allclose(
            reg[:, sl] / (4, 8, 16, 32)[lv], fx[f"fcos_reg_l{lv}"],
            rtol=1e-5, atol=1e-5, err_msg=f"reg level {lv}")
        off += n

    pos = fx["fcos_pos_l0_s1"].astype(bool)
    n0 = len(per_level[0])
    got_ctr = np.asarray(
        centerness_targets(reg[1, :n0][pos] / 4.0))
    np.testing.assert_allclose(
        got_ctr, fx["fcos_centerness_l0_s1"], rtol=1e-5, atol=1e-6)
