#!/bin/bash
# MAE pretraining — hyperparameters mirror the reference train_mae3d.sh
# (reference: nerf_mae/train_mae3d.sh:16-35: lr 1e-4, wd 1e-3, batch 32,
#  2000 epochs, mask 0.75, res 160, swin_s). DDP over 8 GPUs becomes one
# data-parallel mesh over all local TPU chips.
set -e
DATA_ROOT=${DATA_ROOT:-dataset/front3d}
python scripts/run_mae_pretrain.py \
  --mode train \
  --dataset front3d \
  --features_path "$DATA_ROOT/features" \
  --dataset_split "$DATA_ROOT/3dfront_split.npz" \
  --backbone_type swin_s \
  --resolution 160 --masking_prob 0.75 --masking_strategy random \
  --batch_size 32 --num_epochs 2000 \
  --lr 1e-4 --weight_decay 1e-3 --clip_grad_norm 0.1 \
  --flip_prob 0.5 --rotate_prob 0.5 \
  --log_interval 10 --eval_interval 200 --ckpt_interval 500 \
  --checkpoint_dir checkpoints/mae_swin_s --log_dir logs "$@"
