#!/bin/bash
# Anchor-based RPN (reference: nerf_rpn/train.sh via run_rpn.py)
set -e
DATA_ROOT=${DATA_ROOT:-dataset/front3d_rpn}
python scripts/run_rpn.py \
  --mode train --dataset front3d \
  --features_path "$DATA_ROOT/features" \
  --boxes_path "$DATA_ROOT/aabb" \
  --dataset_split "$DATA_ROOT/3dfront_split.npz" \
  --mae_checkpoint checkpoints/mae_swin_s \
  --backbone_type swin_s --resolution 160 \
  --batch_size 8 --num_epochs 1000 --lr 3e-4 --weight_decay 1e-3 \
  --checkpoint_dir checkpoints/rpn "$@"
