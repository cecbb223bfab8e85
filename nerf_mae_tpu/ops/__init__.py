from nerf_mae_tpu.ops.pos_embed import sincos_pos_embed_3d
from nerf_mae_tpu.ops.patchify import patchify_3d, unpatchify_3d, voxel_validity_mask
from nerf_mae_tpu.ops.masking import block_mask_3d
from nerf_mae_tpu.ops.window_attention import (
    window_partition_3d,
    window_unpartition_3d,
    relative_position_index_3d,
    shifted_window_mask,
    window_attention_3d,
)

__all__ = [
    "sincos_pos_embed_3d",
    "patchify_3d",
    "unpatchify_3d",
    "voxel_validity_mask",
    "block_mask_3d",
    "window_partition_3d",
    "window_unpartition_3d",
    "relative_position_index_3d",
    "shifted_window_mask",
    "window_attention_3d",
]
