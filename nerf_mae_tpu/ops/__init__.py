from nerf_mae_tpu.ops.pos_embed import sincos_pos_embed_3d
from nerf_mae_tpu.ops.patchify import (
    maybe_unflatten_patches,
    patchify_3d,
    unpatchify_3d,
    voxel_validity_mask,
)
from nerf_mae_tpu.ops.masking import block_mask_3d
from nerf_mae_tpu.ops.window_attention import (
    window_partition_3d,
    window_unpartition_3d,
    relative_position_index_3d,
    shifted_window_mask,
    window_attention_3d,
)
from nerf_mae_tpu.ops.boxes import (
    box_iou_aabb,
    box_volume,
    clip_boxes_to_grid,
    small_box_mask,
)
from nerf_mae_tpu.ops.rotated_iou import (
    box_iou_obb_pairwise,
    diou_3d_loss,
    giou_3d_loss,
    iou_3d,
)
from nerf_mae_tpu.ops.nms import nms_mask
from nerf_mae_tpu.ops.pallas_attention import fused_window_attention

__all__ = [
    "sincos_pos_embed_3d",
    "maybe_unflatten_patches",
    "patchify_3d",
    "unpatchify_3d",
    "voxel_validity_mask",
    "block_mask_3d",
    "window_partition_3d",
    "window_unpartition_3d",
    "relative_position_index_3d",
    "shifted_window_mask",
    "window_attention_3d",
    "box_iou_aabb",
    "box_volume",
    "clip_boxes_to_grid",
    "small_box_mask",
    "box_iou_obb_pairwise",
    "iou_3d",
    "giou_3d_loss",
    "diou_3d_loss",
    "nms_mask",
    "fused_window_attention",
]
