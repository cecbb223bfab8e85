#!/bin/bash
# Voxel semantic segmentation, 19 Front3D classes
# (reference: nerf_rpn/train_voxel_semantics.sh, class weights from
#  run_voxel_semantics.py:426-432)
set -e
DATA_ROOT=${DATA_ROOT:-dataset/front3d_sem}
python scripts/run_voxel_semantics.py \
  --mode train --dataset front3d \
  --features_path "$DATA_ROOT/features" \
  --sem_feat_path "$DATA_ROOT/sem_voxels" \
  --dataset_split "$DATA_ROOT/3dfront_split.npz" \
  --mae_checkpoint checkpoints/mae_swin_s \
  --backbone_type swin_s --resolution 160 --num_classes 19 \
  --class_weights "$DATA_ROOT/class_weights.npy" \
  --batch_size 8 --num_epochs 500 --lr 1e-4 --weight_decay 1e-3 \
  --checkpoint_dir checkpoints/voxel_semantics "$@"
