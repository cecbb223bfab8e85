#!/bin/bash
# Resume launch/e2e_synthetic_sr.sh from stage 3 (scratch SR baseline) —
# stages 1-2 completed 2026-08-19 (mae @ 800 steps, sr_mae @ 400 steps,
# final train PSNR 29.06 dB); the session ended before stage 3 produced output.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-runs/e2e_synthetic_sr}
RES=64; OUT_RES=96; BB=swin_s; N_FT=16; N_VAL=16; SR_STEPS=400; BATCH=8

echo "=== 3/4: VoxelSR from scratch (same budget) ==="
python scripts/run_voxel_sr.py --mode train --dataset synthetic --transfer_dtype bfloat16 --device_data \
    --n_synthetic "$N_FT" --seed 77 --backbone_type "$BB" \
    --resolution "$RES" --out_resolution "$OUT_RES" \
    --batch_size "$BATCH" --steps "$SR_STEPS" --lr 3e-4 \
    --checkpoint_dir "$OUT/sr_scratch" \
    --eval_interval 100000 --ckpt_interval 100000 --log_interval 50

echo "=== 4/4: eval PSNR on the held-out draw ==="
python scripts/run_voxel_sr.py --mode eval --dataset synthetic \
    --n_synthetic "$N_FT" --n_synthetic_val "$N_VAL" --seed 77 \
    --backbone_type "$BB" --resolution "$RES" --out_resolution "$OUT_RES" \
    --batch_size "$BATCH" --checkpoint "$OUT/sr_mae" \
    --eval_json "$OUT/eval_mae.json"
python scripts/run_voxel_sr.py --mode eval --dataset synthetic \
    --n_synthetic "$N_FT" --n_synthetic_val "$N_VAL" --seed 77 \
    --backbone_type "$BB" --resolution "$RES" --out_resolution "$OUT_RES" \
    --batch_size "$BATCH" --checkpoint "$OUT/sr_scratch" \
    --eval_json "$OUT/eval_scratch.json"

echo "=== results ==="
python - <<'EOF'
import json, os
out = os.environ.get("OUT", "runs/e2e_synthetic_sr")
mae = json.load(open(f"{out}/eval_mae.json"))
scr = json.load(open(f"{out}/eval_scratch.json"))
for k in sorted(set(mae) & set(scr)):
    print(f"{k:>20}: mae={mae[k]:.4f} scratch={scr[k]:.4f}")
EOF
