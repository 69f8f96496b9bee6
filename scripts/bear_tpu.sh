#!/usr/bin/env bash
# Two-phase bear recipe with the TPU-TUNED flagship field — same pipeline
# as scripts/bear.sh (reference parity recipe) but using the quality-gated
# fast configuration (docs/PERF.md):
#   * -O occupancy fast path
#   * tri-plane field (128,512)x(16,8)  (25.25 dB on the bear-class fixture
#     vs 25.55 for the reference-parity 16x2 grid — inside +-0.5 dB)
#   * 40 kept samples/ray, cross-ray compaction 0.35 over 64-ray blocks
#     (14 slots/ray — the measured quality/throughput knee: 25.34 dB and
#     +10% over the round-4 0.4/32 setting; 12 slots/ray fails the gate)
# ~283k rays/s/chip train step on a v5e (vs 1.3k for the parity grid).
set -e

DATA=${1:-/data/bear}
TPU_FLAGS=(--grid_type triplane --triplane_res 128 512
           --triplane_channels 16 8 --num_steps 40 --upsample_steps 0
           --compact_frac 0.35 --compact_block 64)

# phase 1: reconstruction with mask channel
python main.py -O \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace outputs/bear_recon_tpu \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  "${TPU_FLAGS[@]}" \
  --ckpt scratch

# phase 2: text-driven edit via LGIE + SDS (compaction ON: compact_remat
# keeps the one-hot matrices out of the fused graph's residuals — compiles
# in ~2 min and runs +45% faster on chip, docs/PERF.md "Editing +
# compaction")
python main.py -O \
  --data_type nerfstudio --data_path "$DATA" --keyword lang_bear \
  --workspace outputs/bear_edit_tpu \
  --iters 3000 --train_resolution_level 7 --eval_resolution_level 4 \
  --bound 2 --train_conf 0.01 --soft_mask \
  "${TPU_FLAGS[@]}" \
  --pretrained --editing_from outputs/bear_recon_tpu/checkpoints/df_ep0030.pth \
  --text "a corgi in a forest" --text_fg "a corgi" \
  --lambda_sd 0.01 --keep_bg 1000 --cfg 100 \
  --random_bg_c --detach_bg --clip_view --stage_time \
  --sd_version 1.5 --sd_weights "${SD_WEIGHTS:-}" \
  --clip_weights "${CLIP_WEIGHTS:-}" \
  --ckpt scratch
