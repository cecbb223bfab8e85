#!/bin/bash
# Voxel super-resolution 160^3 -> 256^3 (reference: nerf_rpn/train_voxelSR.sh)
set -e
DATA_ROOT=${DATA_ROOT:-dataset/front3d_sr}
python scripts/run_voxel_sr.py \
  --mode train --dataset front3d \
  --features_path "$DATA_ROOT/features_160" \
  --out_feat_path "$DATA_ROOT/features_256" \
  --dataset_split "$DATA_ROOT/3dfront_split.npz" \
  --mae_checkpoint checkpoints/mae_swin_s \
  --backbone_type swin_s --resolution 160 --out_resolution 256 \
  --batch_size 8 --num_epochs 500 --lr 1e-4 --weight_decay 1e-3 \
  --checkpoint_dir checkpoints/voxel_sr "$@"
