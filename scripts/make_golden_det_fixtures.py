#!/usr/bin/env python
"""Generate golden detection-math fixtures from the reference PyTorch code.

Runs the *actual* reference implementations under /root/reference/nerf_rpn
on seeded random inputs and records their outputs to
tests/fixtures/golden_det.npz:

  - rotated 3D IoU / GIoU / DIoU   (model/rotated_iou/oriented_iou_loss.py)
  - AABB + OBB pairwise IoU        (model/utils.py:387 box_iou_3d)
  - greedy NMS keep sets           (model/utils.py:215)
  - torchvision-style Matcher      (model/utils.py:98)
  - AABB / rotated / midpoint-offset box coders (model/coder/*)
  - Detectron recall / VOC AP / precision      (eval.py:14,84,319)
  - FCOS target assignment + centerness        (model/fcos/loss.py:269-445)

tests/test_parity_golden_det.py pins our JAX/numpy counterparts to these
values. Two compiled/unavailable third-party deps are shimmed with their
documented semantics (clearly scoped below): torchvision ops (as in
make_golden_fixtures.py, plus sigmoid_focal_loss) and the reference's CUDA
`sort_vertices` extension (cuda_op/sort_vert_kernel.cu:42-135) — the shim is
a line-faithful numpy port of that kernel, used only to *generate* reference
outputs; our framework's angle-argsort (ops/rotated_iou.py) never sees it.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
OUT = os.path.join(REPO, "tests", "fixtures", "golden_det.npz")

EPS = 1e-8


def _compare_vertices(x1, y1, x2, y2):
    """sort_vert_kernel.cu:15-40 compare_vertices, line for line."""
    if abs(x1 - x2) < EPS and abs(y2 - y1) < EPS:
        return False
    if y1 > 0 and y2 < 0:
        return True
    if y1 < 0 and y2 > 0:
        return False
    n1 = x1 * x1 + y1 * y1 + EPS
    n2 = x2 * x2 + y2 * y2 + EPS
    if y1 > 0 and y2 > 0:
        return abs(x1) * x1 / n1 - abs(x2) * x2 / n2 > EPS
    if y1 < 0 and y2 < 0:
        return abs(x1) * x1 / n1 - abs(x2) * x2 / n2 < EPS
    # y1 == 0 or y2 == 0 exactly: undefined (falls off the CUDA function);
    # measure-zero for the random inputs used here
    return False


def _sort_vertices_np(vertices, mask, num_valid):
    """sort_vert_kernel.cu:42-135 sort_vertices_kernel, line for line."""
    B, N, M, _ = vertices.shape
    idx = np.zeros((B, N, 9), np.int64)
    for bi in range(B):
        for ni in range(N):
            v, mk = vertices[bi, ni], mask[bi, ni]
            pads = np.nonzero(~mk[8:])[0]
            pad = int(8 + pads[0]) if len(pads) else 0
            nv = int(num_valid[bi, ni])
            if nv < 3:
                idx[bi, ni, :] = pad
                continue
            for j in range(nv):
                x_min, y_min, i_take = 1.0, -EPS, 0
                for k in range(M):
                    x, y = float(v[k, 0]), float(v[k, 1])
                    if j == 0:
                        ok = mk[k] and _compare_vertices(x, y, x_min, y_min)
                    else:
                        i2 = idx[bi, ni, j - 1]
                        x2, y2 = float(v[i2, 0]), float(v[i2, 1])
                        ok = (mk[k] and _compare_vertices(x, y, x_min, y_min)
                              and _compare_vertices(x2, y2, x, y))
                    if ok:
                        x_min, y_min, i_take = x, y, k
                idx[bi, ni, j] = i_take
            idx[bi, ni, nv] = idx[bi, ni, 0]
            idx[bi, ni, nv + 1:] = pad
            if nv == 8:  # identical-boxes corner case (kernel :113-131)
                counter = sum(
                    int(idx[bi, ni, k] == idx[bi, ni, j])
                    for j in range(4) for k in range(4, 8)
                )
                if counter == 4:
                    idx[bi, ni, 4] = idx[bi, ni, 0]
                    idx[bi, ni, 5:] = pad
    return idx


def _install_shims():
    from make_golden_fixtures import _install_torchvision_shims

    _install_torchvision_shims()

    # torchvision.ops.sigmoid_focal_loss (public documented semantics);
    # imported by fcos/loss.py:18 but not exercised by prepare_targets
    def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2.0,
                           reduction="none"):
        p = torch.sigmoid(inputs)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    sys.modules["torchvision"].ops.sigmoid_focal_loss = sigmoid_focal_loss
    sys.modules["torchvision.ops"].sigmoid_focal_loss = sigmoid_focal_loss

    # the compiled `sort_vertices` CUDA module (cuda_op/cuda_ext.py:4)
    sv = types.ModuleType("sort_vertices")

    def sort_vertices_forward(vertices, mask, num_valid):
        out = _sort_vertices_np(vertices.detach().numpy(),
                                mask.detach().numpy(),
                                num_valid.detach().numpy())
        return torch.from_numpy(out)

    sv.sort_vertices_forward = sort_vertices_forward
    sys.modules["sort_vertices"] = sv

    if not hasattr(np, "float"):
        np.float = float  # numpy<1.24 alias used by the reference

    # device-placement no-op: the reference's OBB IoU matrix hardcodes
    # `.cuda()` (model/utils.py:412); numerics are device-independent
    torch.Tensor.cuda = lambda self, *a, **k: self


def _rand_obb(rs, *shape, extent=10.0):
    """[*, 7] (x, y, z, w, l, h, theta) boxes with sane sizes."""
    ctr = rs.uniform(1.0, extent, shape + (3,))
    size = rs.uniform(0.5, 3.0, shape + (3,))
    ang = rs.uniform(-np.pi, np.pi, shape + (1,))
    return np.concatenate([ctr, size, ang], -1).astype(np.float32)


def _rand_aabb(rs, n, extent=32.0):
    lo = rs.uniform(0.0, extent - 4.0, (n, 3))
    sz = rs.uniform(1.0, 8.0, (n, 3))
    return np.concatenate([lo, np.minimum(lo + sz, extent)], -1).astype(
        np.float32)


def main():
    _install_shims()
    sys.path.insert(0, "/root/reference/nerf_rpn")
    from model.rotated_iou.oriented_iou_loss import (
        cal_diou_3d, cal_giou_3d, cal_iou_3d)
    from model.utils import Matcher, box_iou_3d, nms
    from model.coder.AABB_coder import AABBCoder
    from model.coder.midpoint_offset_coder import MidpointOffsetCoder
    from model.coder.rotated_coder import RotatedCoder
    from model.fcos.loss import FCOSLossComputation
    from model.fcos.fcos import FCOSModule
    import eval as ref_eval

    fx = {}
    torch.manual_seed(0)

    # ---- rotated IoU family -------------------------------------------
    rs = np.random.RandomState(10)
    b1 = _rand_obb(rs, 1, 96)
    b2 = _rand_obb(rs, 1, 96)
    # overlap-rich tail: perturbations of b1, plus 4 exactly-equal pairs
    b2[0, :48] = b1[0, :48] + rs.uniform(-0.5, 0.5, (48, 7)).astype(np.float32)
    b2[0, :4] = b1[0, :4]
    t1, t2 = torch.tensor(b1), torch.tensor(b2)
    fx["iou_b1"], fx["iou_b2"] = b1, b2
    fx["iou"] = cal_iou_3d(t1, t2).numpy()
    gl, _, gi = cal_giou_3d(t1, t2, "smallest")
    fx["giou_loss"], fx["giou_iou"] = gl.numpy(), gi.numpy()
    gl_al, _, _ = cal_giou_3d(t1, t2, "aligned")
    fx["giou_loss_aligned"] = gl_al.numpy()
    dl, _ = cal_diou_3d(t1, t2, "smallest")
    fx["diou_loss"] = dl.numpy()

    # ---- pairwise IoU matrices ----------------------------------------
    rs = np.random.RandomState(11)
    a1, a2 = _rand_aabb(rs, 40), _rand_aabb(rs, 50)
    fx["aabb_m1"], fx["aabb_m2"] = a1, a2
    fx["aabb_iou_matrix"] = box_iou_3d(
        torch.tensor(a1), torch.tensor(a2)).numpy()
    o1, o2 = _rand_obb(rs, 20), _rand_obb(rs, 25)
    fx["obb_m1"], fx["obb_m2"] = o1, o2
    fx["obb_iou_matrix"] = box_iou_3d(
        torch.tensor(o1), torch.tensor(o2)).numpy()

    # ---- greedy NMS ----------------------------------------------------
    rs = np.random.RandomState(12)
    nb = _rand_aabb(rs, 120, extent=16.0)  # dense -> plenty of overlap
    ns = rs.rand(120).astype(np.float32)
    fx["nms_boxes"], fx["nms_scores"] = nb, ns
    for th in (25, 50):
        keep = nms(torch.tensor(nb), torch.tensor(ns), th / 100.0).numpy()
        fx[f"nms_keep_{th}"] = keep

    # ---- Matcher -------------------------------------------------------
    rs = np.random.RandomState(13)
    quality = rs.rand(8, 300).astype(np.float32)
    quality[:, :30] *= 0.25  # guarantee below-low rows
    fx["match_quality"] = quality
    for tag, (hi, lo, lq) in {
        "rpn": (0.35, 0.2, True), "strict": (0.7, 0.3, False),
    }.items():
        m = Matcher(hi, lo, allow_low_quality_matches=lq)
        fx[f"match_{tag}"] = m(torch.tensor(quality)).numpy()

    # ---- box coders ----------------------------------------------------
    rs = np.random.RandomState(14)
    anchors = _rand_aabb(rs, 64)
    gts = _rand_aabb(rs, 64)
    fx["coder_anchors"], fx["coder_gts"] = anchors, gts
    aabb = AABBCoder()
    enc = aabb.encode_single(torch.tensor(gts), torch.tensor(anchors))
    fx["aabb_deltas"] = enc.numpy()
    deltas = rs.uniform(-1.0, 1.0, (64, 6)).astype(np.float32)
    fx["coder_rand_deltas"] = deltas
    fx["aabb_decoded"] = aabb.decode_single(
        torch.tensor(deltas), torch.tensor(anchors)).numpy()

    rois7 = _rand_obb(rs, 64)
    gt7 = _rand_obb(rs, 64)
    fx["coder_rois7"], fx["coder_gt7"] = rois7, gt7
    rot = RotatedCoder()
    fx["rot_deltas"] = rot.encode_single(
        torch.tensor(gt7), torch.tensor(rois7)).numpy()
    deltas7 = rs.uniform(-0.5, 0.5, (64, 7)).astype(np.float32)
    fx["coder_rand_deltas7"] = deltas7
    fx["rot_decoded"] = rot.decode_single(
        torch.tensor(deltas7), torch.tensor(rois7)).numpy()

    mid = MidpointOffsetCoder()
    fx["mid_deltas"] = mid.encode_single(
        torch.tensor(gt7), torch.tensor(anchors)).numpy()
    deltas8 = rs.uniform(-0.5, 0.5, (64, 8)).astype(np.float32)
    # da/db midpoint offsets: span the clamp range (both sides clamp to
    # [-0.5, 0.5] — midpoint_offset_coder.py:202-203)
    deltas8[:, 6:] = rs.uniform(-0.6, 0.6, (64, 2))
    fx["coder_rand_deltas8"] = deltas8
    fx["mid_decoded"] = mid.decode_single(
        torch.tensor(deltas8), torch.tensor(anchors)).numpy()

    # ---- eval: recall / AP / precision ---------------------------------
    rs = np.random.RandomState(15)
    props, scores, gtl = [], [], []
    for i in range(4):
        gt = _rand_aabb(rs, 5)
        p = np.concatenate([
            gt + rs.uniform(-1.0, 1.0, gt.shape).astype(np.float32),
            _rand_aabb(rs, 45),
        ])
        props.append(p)
        scores.append(rs.rand(len(p)).astype(np.float32))
        gtl.append(gt)
    for i in range(4):
        fx[f"eval_props_{i}"], fx[f"eval_scores_{i}"] = props[i], scores[i]
        fx[f"eval_gt_{i}"] = gtl[i]
    tp = [torch.tensor(x) for x in props]
    ts = [torch.tensor(x) for x in scores]
    tg = [torch.tensor(x) for x in gtl]
    rec = ref_eval.evaluate_box_proposals_recall(tp, ts, tg, limit=30)
    fx["eval_recalls"] = rec["recalls"].numpy()
    fx["eval_ar"] = np.float32(rec["ar"].item())
    fx["eval_num_pos"] = np.int32(rec["num_pos"])
    for th in (25, 50):
        ap = ref_eval.evaluate_box_proposals_ap(tp, ts, tg,
                                                iou_thresh=th / 100.0)
        fx[f"eval_ap_{th}"] = np.float32(ap["ap"].item())
    prec = ref_eval.evaluate_box_proposals_precision(
        tp, ts, tg, score_thresh=0.5)
    fx["eval_precisions"] = prec["precisions"].numpy()
    fx["eval_num_det"] = np.int32(prec["num_det"])

    # ---- FCOS target assignment (AABB) ---------------------------------
    rs = np.random.RandomState(16)
    strides = [4, 8, 16, 32]
    dims = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]  # 32^3 scene
    points = [
        FCOSModule.compute_locations_per_level(None, w, l, h, s, "cpu")
        for (w, l, h), s in zip(dims, strides)
    ]
    gt_counts = [3, 5]
    gt_scenes = [_rand_aabb(rs, c) for c in gt_counts]
    # make box 0 of scene 0 big so it lands on coarse levels
    gt_scenes[0][0] = [1.0, 1.0, 1.0, 31.0, 31.0, 29.0]
    fx["fcos_gt_0"], fx["fcos_gt_1"] = gt_scenes
    comp = FCOSLossComputation(
        fpn_strides=strides, center_sampling_radius=1.5,
        iou_loss_type="iou", norm_reg_targets=True, world_size=1,
        use_obb=False, use_additional_l1_loss=False)
    labels_lf, reg_lf = comp.prepare_targets(
        points, [torch.tensor(g) for g in gt_scenes])
    for lv in range(4):
        np_lv = len(points[lv])
        fx[f"fcos_labels_l{lv}"] = (
            labels_lf[lv].reshape(len(gt_counts), np_lv).numpy())
        fx[f"fcos_reg_l{lv}"] = (
            reg_lf[lv].reshape(len(gt_counts), np_lv, 6).numpy())
    # centerness on the positives of the finest level, scene 1
    pos = labels_lf[0].reshape(2, -1)[1] > 0
    fx["fcos_pos_l0_s1"] = pos.numpy()
    fx["fcos_centerness_l0_s1"] = comp.compute_centerness_targets(
        reg_lf[0].reshape(2, -1, 6)[1][pos]).numpy()

    # ---- anchor generation ----------------------------------------------
    from model.anchor import AnchorGenerator3D

    sizes = ((8.0,), (16.0,), (32.0,), (64.0,))
    ratios = (((1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (1.0, 2.0, 2.0),
               (1.0, 1.0, 3.0), (1.0, 3.0, 3.0)),) * 4  # run_rpn.py:32-35
    gen = AnchorGenerator3D(sizes, ratios, is_normalized=False)
    gen.set_cell_anchors(torch.float32, "cpu")
    grid_dims = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    anchor_strides = [(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32)]
    ref_anchors = gen.grid_anchors(grid_dims, anchor_strides)
    for lv, a in enumerate(ref_anchors):
        fx[f"anchors_l{lv}"] = a.numpy()

    # ---- full FCOS loss (cls + reg + centerness), AABB and OBB ----------
    rs = np.random.RandomState(17)
    ori_sizes = [(32, 32, 32), (25, 28, 30)]
    fx["floss_sizes"] = np.asarray(ori_sizes, np.int32)
    masks = [
        FCOSModule.compute_padding_masks_per_level(None, pl, ori_sizes)
        for pl in points
    ]
    gt_obb = []
    for c in gt_counts:
        ctr = rs.uniform(6.0, 26.0, (c, 3))
        size = rs.uniform(2.0, 10.0, (c, 3))
        ang = rs.uniform(-np.pi, np.pi, (c, 1))
        gt_obb.append(np.concatenate([ctr, size, ang], -1).astype(np.float32))
    fx["floss_gt_obb_0"], fx["floss_gt_obb_1"] = gt_obb

    for mode, use_obb, gts_mode in (("aabb", False, gt_scenes),
                                    ("obb", True, gt_obb)):
        rd = 8 if use_obb else 6
        cls_l, reg_l, ctr_l = [], [], []  # channel-last, ours' layout
        for (w, l, h) in dims:
            cls_l.append(rs.normal(size=(2, w, l, h, 1)).astype(np.float32))
            r = rs.uniform(0.1, 6.0, (2, w, l, h, rd)).astype(np.float32)
            if use_obb:
                r[..., 6:] = rs.uniform(-0.4, 0.4, (2, w, l, h, 2))
            reg_l.append(r)
            ctr_l.append(rs.normal(size=(2, w, l, h, 1)).astype(np.float32))
        for lv in range(4):
            fx[f"floss_{mode}_cls_l{lv}"] = cls_l[lv]
            fx[f"floss_{mode}_reg_l{lv}"] = reg_l[lv]
            fx[f"floss_{mode}_ctr_l{lv}"] = ctr_l[lv]
        comp_m = FCOSLossComputation(
            fpn_strides=strides, center_sampling_radius=1.5,
            iou_loss_type="iou", norm_reg_targets=True, world_size=1,
            use_obb=use_obb, use_additional_l1_loss=False)
        to_cf = lambda x: torch.tensor(np.moveaxis(x, -1, 1))  # channel-first
        cls_t, reg_t, ctr_t = comp_m(
            points, [to_cf(x) for x in cls_l], [to_cf(x) for x in reg_l],
            [to_cf(x) for x in ctr_l],
            [torch.tensor(g) for g in gts_mode], masks)
        fx[f"floss_{mode}_cls"] = np.float32(cls_t.item())
        fx[f"floss_{mode}_reg"] = np.float32(reg_t.item())
        fx[f"floss_{mode}_ctr"] = np.float32(ctr_t.item())

    # ---- 2D projection loss: cameras + the OBB FCOS loss with weight>0 ---
    from model.fcos.utils import get_w2cs, project

    w2cs = torch.stack([torch.tensor(np.asarray(p)) for p in
                        get_w2cs(res=32)])
    fx["proj_w2cs"] = w2cs.numpy().astype(np.float32)
    rs = np.random.RandomState(20)
    pts = rs.uniform(0.0, 32.0, (10, 3)).astype(np.float32)
    fx["proj_points"] = pts
    K = torch.tensor([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    homog = torch.cat([torch.tensor(pts), torch.ones(10, 1)], dim=1)
    fx["proj_pixels"] = torch.stack(
        [project(K, w2cs[v], homog) for v in range(4)]).numpy()

    # the reference hardcodes its camera rig to res=160 and divides by 160
    # (fcos/loss.py:449-470 — written for its fixed 160^3 input); align the
    # rig to this fixture's 32^3 grid so the projection math is comparable
    # (the test accounts for the hardcoded /160 divisor explicitly)
    import model.fcos.loss as floss_mod

    orig_w2cs = floss_mod.get_w2cs
    floss_mod.get_w2cs = lambda res=160: get_w2cs(res=32)
    comp_proj = FCOSLossComputation(
        fpn_strides=strides, center_sampling_radius=1.5,
        iou_loss_type="iou", norm_reg_targets=True, world_size=1,
        use_obb=True, use_additional_l1_loss=False, proj2d_loss_weight=0.7)
    to_cf = lambda x: torch.tensor(np.moveaxis(x, -1, 1))
    _, reg_t_, _ = comp_proj(
        points,
        [to_cf(fx[f"floss_obb_cls_l{lv}"]) for lv in range(4)],
        [to_cf(fx[f"floss_obb_reg_l{lv}"]) for lv in range(4)],
        [to_cf(fx[f"floss_obb_ctr_l{lv}"]) for lv in range(4)],
        [torch.tensor(g) for g in gt_obb], masks)
    fx["floss_obb_reg_proj"] = np.float32(reg_t_.item())
    floss_mod.get_w2cs = orig_w2cs

    # ---- FCOS post-processing (inference path) --------------------------
    from model.fcos.inference import FCOSPostProcessor

    pp = FCOSPostProcessor(
        pre_nms_thresh=0.2, pre_nms_top_n=50, nms_thresh=0.3,
        fpn_post_nms_top_n=30, min_size=0.0, num_classes=1, use_obb=False)
    pp_obb = FCOSPostProcessor(
        pre_nms_thresh=0.2, pre_nms_top_n=50, nms_thresh=0.3,
        fpn_post_nms_top_n=30, min_size=0.0, num_classes=1, use_obb=True)
    for mode, proc in (("aabb", pp), ("obb", pp_obb)):
        cls_t = [torch.tensor(np.moveaxis(fx[f"floss_{mode}_cls_l{lv}"], -1, 1))
                 for lv in range(4)]
        # the reference head scales the first 6 (normalized) reg channels by
        # the fpn stride at eval time before the post-processor sees them
        # (fcos/fcos.py:124-133); our fcos_postprocess folds that scaling in
        def scaled_reg(lv):
            r = fx[f"floss_{mode}_reg_l{lv}"].copy()
            r[..., :6] *= strides[lv]
            return torch.tensor(np.moveaxis(r, -1, 1))

        reg_t = [scaled_reg(lv) for lv in range(4)]
        ctr_t = [torch.tensor(np.moveaxis(fx[f"floss_{mode}_ctr_l{lv}"], -1, 1))
                 for lv in range(4)]
        boxes_r, scores_r = proc(points, cls_t, reg_t, ctr_t, ori_sizes,
                                 masks)
        for i in range(2):
            order = torch.argsort(scores_r[i], descending=True)
            fx[f"pp_{mode}_boxes_{i}"] = boxes_r[i][order].numpy()  # lvl + box
            fx[f"pp_{mode}_scores_{i}"] = scores_r[i][order].numpy()

    # ---- RPN proposal filtering + anchor padding masks -------------------
    from model.rpn import RegionProposalNetwork, permute_and_flatten

    rs = np.random.RandomState(18)
    num_per_level = [a.shape[0] for a in ref_anchors]
    A = sum(num_per_level)
    anchors_cat = torch.cat(ref_anchors)
    obj = rs.normal(size=(2, A)).astype(np.float32)
    deltas6 = rs.uniform(-0.5, 0.5, (2, A, 6)).astype(np.float32)
    fx["rpn_obj"], fx["rpn_deltas"] = obj, deltas6

    # reference padding masks: per-cell ceil rule -> permute_and_flatten
    feats = [torch.zeros(2, 1, *d) for d in grid_dims]
    meshes = torch.zeros(2, 4, 32, 32, 32)
    masks_lvl = gen.get_padding_masks(meshes, feats, ori_sizes)
    n_base = gen.num_anchors_per_location()[0]
    masks_flat = torch.cat(
        [permute_and_flatten(m.reshape(2, -1, *m.shape[2:]), 2, n_base, 1,
                             *m.shape[2:]).squeeze(-1)
         for m in masks_lvl], dim=1)
    fx["rpn_pad_mask"] = masks_flat.numpy()

    props = torch.stack([
        aabb.decode_single(torch.tensor(deltas6[i]), anchors_cat)
        for i in range(2)
    ])
    ns = types.SimpleNamespace(
        min_size=1e-3, score_thresh=0.0, nms_thresh=0.3, training=False,
        _pre_nms_top_n={"testing": 100}, _post_nms_top_n={"testing": 30})
    ns.pre_nms_top_n = lambda: 100
    ns.post_nms_top_n = lambda: 30
    ns._get_top_n_idx = lambda o, n: RegionProposalNetwork._get_top_n_idx(
        ns, o, n)
    lvl_idx = torch.arange(A).reshape(1, -1).expand(2, -1)
    fboxes, fscores, _ = RegionProposalNetwork.filter_proposals(
        ns, props, torch.tensor(obj), lvl_idx, ori_sizes, num_per_level,
        masks_flat)
    for i in range(2):
        order = torch.argsort(fscores[i], descending=True)
        fx[f"rpn_boxes_{i}"] = fboxes[i][order].numpy()
        fx[f"rpn_scores_{i}"] = fscores[i][order].numpy()

    # ---- metrics: masked MSE/PSNR + intersectionAndUnion ------------------
    # torchmetrics is not installed; metrics.py only uses JaccardIndex in a
    # helper we don't exercise — stub the import
    tm = types.ModuleType("torchmetrics")
    tm.JaccardIndex = object
    sys.modules.setdefault("torchmetrics", tm)
    from model.metrics import intersectionAndUnionGPU, mse, psnr

    rs = np.random.RandomState(19)
    pr = rs.rand(2, 16, 16, 16, 3).astype(np.float32)
    gt = rs.rand(2, 16, 16, 16, 3).astype(np.float32)
    msk = rs.rand(2, 16, 16, 16, 1) > 0.4
    fx["met_pred"], fx["met_gt"], fx["met_mask"] = pr, gt, msk
    fx["met_mse"] = np.float32(mse(
        torch.tensor(pr), torch.tensor(gt), torch.tensor(msk)).item())
    fx["met_psnr"] = np.float32(psnr(
        torch.tensor(pr), torch.tensor(gt), torch.tensor(msk)).item())

    K = 19
    seg_pred = rs.randint(0, K, (2, 12, 12, 12))
    seg_tgt = rs.randint(0, K, (2, 12, 12, 12))
    fx["seg_pred"], fx["seg_tgt"] = seg_pred, seg_tgt
    inter, union, tgta = intersectionAndUnionGPU(
        torch.tensor(seg_pred).float(), torch.tensor(seg_tgt).float(), K)
    fx["seg_inter"], fx["seg_union"] = inter.numpy(), union.numpy()
    fx["seg_target_area"] = tgta.numpy()

    # ---- semantics losses: masked weighted CE + soft-mIoU ----------------
    from model.metrics import mIoULoss_new, masked_cross_entropy

    rs = np.random.RandomState(21)
    lgt = rs.normal(size=(1, 8, 8, 8, K)).astype(np.float32)
    tg = rs.randint(0, K, (1, 8, 8, 8))
    tg.reshape(-1)[:K] = np.arange(K)  # every class present (see test note)
    fx["sem_logits"], fx["sem_targets"] = lgt, tg
    w = rs.uniform(0.5, 2.0, K).astype(np.float32)
    w[0] = 0.0  # void class zeroed, like calculate_class_weights
    fx["sem_weights"] = w
    tt = torch.tensor(tg)
    mask_t = (tt > 0).long()
    for tag, crit in (
        ("w", torch.nn.CrossEntropyLoss(weight=torch.tensor(w))),
        ("unw", torch.nn.CrossEntropyLoss()),
    ):
        ce = masked_cross_entropy(crit, tt.unsqueeze(-1), torch.tensor(lgt),
                                  mask_t.unsqueeze(-1), num_classes=K)
        fx[f"sem_ce_{tag}"] = np.float32(ce.item())
    _, miou = mIoULoss_new(n_classes=K)(
        torch.tensor(lgt), tt.unsqueeze(-1), mask_t.unsqueeze(-1))
    fx["sem_soft_miou"] = np.float32(miou.item())

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **fx)
    print(f"wrote {OUT}: {len(fx)} arrays, "
          f"{os.path.getsize(OUT) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
