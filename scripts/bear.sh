#!/usr/bin/env bash
# Two-phase bear recipe on the TPU-native framework — same flags as the
# reference recipe (reference scripts/bear.sh:4-25).
set -e

DATA=${1:-/data/bear}

# phase 1: reconstruction with mask channel
python main.py -O2 \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace outputs/bear_recon \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  --ckpt scratch

# phase 2: text-driven edit via LGIE + SDS
python main.py -O2 \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace outputs/bear_edit \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  --pretrained --editing_from outputs/bear_recon/checkpoints/df_ep0030.pth \
  --text "a corgi in a forest" --text_fg "a corgi" \
  --lambda_sd 0.01 --keep_bg 1000 --cfg 100 \
  --random_bg_c --detach_bg --clip_view --stage_time \
  --sd_version 1.5 --sd_weights "${SD_WEIGHTS:-}" \
  --ckpt scratch
