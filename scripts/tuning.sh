#!/usr/bin/env bash
# Custom Diffusion concept tuning — same recipe shape as the reference
# (reference custom_diffusion/tuning.sh): fine-tune cross-attn K/V adapters
# + a <new1> modifier token on instance images with real-prior preservation,
# emitting pytorch_custom_diffusion_weights.bin + <new1>.bin for --use_cd.
set -e

SD_WEIGHTS=${SD_WEIGHTS:?set SD_WEIGHTS to a local diffusers-format SD dir}
INSTANCE_DIR=${1:-data/bear/images}
CLASS_DATA_DIR=${2:-data_cd/real_reg/samples_bear}
OUTPUT_DIR=${3:-data_cd/bear_cd}

# regularization images: LAION retrieval when clip-retrieval is available,
# else SD-sampled fallback (guidance/retrieve.py, guidance/sampler.py)
# python -m customnerf_tpu.guidance.retrieve --class_prompt bear \
#   --class_data_dir "$CLASS_DATA_DIR" --num_class_images 200

# (hflip + random-scale augmentation and prior preservation are built into
# the trainer: ConceptDataset / prior loss activate when class_data_dir set)
python scripts/tune_custom_diffusion.py \
  --sd_weights "$SD_WEIGHTS" \
  --instance_data_dir "$INSTANCE_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --instance_prompt "photo of a <new1> bear" \
  --resolution 512 \
  --learning_rate 1e-5 \
  --max_train_steps 250 \
  --modifier_token "<new1>" \
  --class_data_dir "$CLASS_DATA_DIR" \
  --class_prompt "bear" --num_class_images 200 --real_prior \
  --prior_loss_weight 1.0
