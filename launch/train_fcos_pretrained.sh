#!/bin/bash
# FCOS OBB detection finetune from a pretrained MAE trunk
# (reference: nerf_rpn/train_fcos_pretrained.sh: lr 1e-4, bs 8, OBB, iou loss)
set -e
DATA_ROOT=${DATA_ROOT:-dataset/front3d_rpn}
python scripts/run_fcos.py \
  --mode train \
  --dataset front3d \
  --features_path "$DATA_ROOT/features" \
  --boxes_path "$DATA_ROOT/obb" \
  --dataset_split "$DATA_ROOT/3dfront_split.npz" \
  --mae_checkpoint checkpoints/mae_swin_s \
  --backbone_type swin_s --resolution 160 \
  --rotated_bbox --iou_loss_type iou --center_sampling_radius 1.5 \
  --batch_size 8 --num_epochs 1000 --lr 1e-4 --weight_decay 1e-3 \
  --flip_prob 0.5 --rotate_prob 0.5 --rot_scale_prob 0.5 \
  --log_interval 10 --eval_interval 500 \
  --checkpoint_dir checkpoints/fcos_front3d --eval_json fcos_eval.json "$@"
