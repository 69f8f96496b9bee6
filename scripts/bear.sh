#!/usr/bin/env bash
# Two-phase bear recipe (reconstruction → LGIE/SDS edit) — the pipeline of
# the reference scripts/bear.sh:4-25.
#
# DEFAULT field config: the quality-gated TPU flagship — -O occupancy fast
# path, tri-plane (128,512)x(16,8), 40 kept samples/ray, cross-ray
# compaction 0.35 over 64-ray blocks — ~283k rays/s/chip on a v5e and
# 25.34 dB on the bear-class fixture, within ±0.5 dB of the
# reference-parity field (docs/PERF.md).  This is what a user copying the
# recipe should run.
#
# Pass --parity as the FIRST argument for the exact reference field +
# macro flags (tiledgrid 16x2 @ log2 21/8192, -O2 dense two-pass render):
# identical semantics to the reference recipe, but gather-row-bound on TPU
# (~1.3k rays/s, ~113 min reconstruction — docs/PERF.md ceiling analysis).
set -e

MODE_FLAGS=(-O --grid_type triplane --triplane_res 128 512
            --triplane_channels 16 8 --num_steps 40 --upsample_steps 0
            --compact_frac 0.35 --compact_block 64)
SUFFIX=""
if [ "${1:-}" == "--parity" ]; then
  shift
  MODE_FLAGS=(-O2)
  SUFFIX="_parity"
fi

DATA=${1:-/data/bear}

# phase 1: reconstruction with mask channel
python main.py "${MODE_FLAGS[@]}" \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace "outputs/bear_recon$SUFFIX" \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  --ckpt scratch

# phase 2: text-driven edit via LGIE + SDS
python main.py "${MODE_FLAGS[@]}" \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace "outputs/bear_edit$SUFFIX" \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  --pretrained --editing_from "outputs/bear_recon$SUFFIX/checkpoints/df_ep0030.pth" \
  --text "a corgi in a forest" --text_fg "a corgi" \
  --lambda_sd 0.01 --keep_bg 1000 --cfg 100 \
  --random_bg_c --detach_bg --clip_view --stage_time \
  --sd_version 1.5 --sd_weights "${SD_WEIGHTS:-}" \
  --clip_weights "${CLIP_WEIGHTS:-}" \
  --ckpt scratch
