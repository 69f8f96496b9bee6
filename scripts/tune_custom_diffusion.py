"""Custom Diffusion concept-tuning CLI.

Equivalent launch surface to the reference recipe
(``custom_diffusion/tuning.sh:8-24``): instance images + prompt, optional
real class images (retrieved or generated), 250 steps, then artifacts
(pytorch_custom_diffusion_weights.bin + <new1>.bin) land in --output_dir,
ready for ``main.py --use_cd <output_dir>``.
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instance_data_dir", required=True)
    p.add_argument("--instance_prompt", required=True,
                   help="class word, e.g. 'cat' (prompt becomes 'photo of a <new1> cat')")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--class_data_dir", default=None)
    p.add_argument("--class_prompt", default="")
    p.add_argument("--num_class_images", type=int, default=200)
    p.add_argument("--real_prior", action="store_true")
    p.add_argument("--modifier_token", default="<new1>")
    p.add_argument("--initializer_token", default="ktn")
    p.add_argument("--max_train_steps", type=int, default=250)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--sd_version", default="1.5")
    p.add_argument("--sd_weights", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--freeze_model", default="crossattn_kv",
                   choices=["crossattn_kv", "crossattn"])
    p.add_argument("--checkpointing_steps", type=int, default=250)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--validation_prompt", default=None)
    p.add_argument("--validation_steps", type=int, default=50)
    p.add_argument("--num_validation_images", type=int, default=2)
    args = p.parse_args()

    from customnerf_tpu.config import Config
    from customnerf_tpu.guidance.custom_diffusion import train_custom_diffusion

    opt = Config(data_type="synthetic", sd_version=args.sd_version,
                 sd_weights=args.sd_weights, seed=args.seed)

    if args.real_prior and args.class_data_dir:
        from customnerf_tpu.guidance.retrieve import retrieve
        try:
            retrieve(args.class_prompt, args.class_data_dir,
                     args.num_class_images)
        except Exception as e:
            print(f"[WARN] class-image retrieval failed: {e}", file=sys.stderr)

    train_custom_diffusion(
        opt,
        instance_dir=args.instance_data_dir,
        instance_prompt=args.instance_prompt,
        output_dir=args.output_dir,
        class_dir=args.class_data_dir,
        class_prompt=args.class_prompt,
        modifier_token=args.modifier_token,
        initializer_token=args.initializer_token,
        steps=args.max_train_steps,
        lr=args.learning_rate,
        prior_loss_weight=args.prior_loss_weight,
        image_size=args.resolution,
        batch_size=args.train_batch_size,
        grad_accum=args.gradient_accumulation_steps,
        freeze_model=args.freeze_model,
        checkpointing_steps=args.checkpointing_steps,
        resume_from_checkpoint=args.resume_from_checkpoint,
        validation_prompt=args.validation_prompt,
        validation_steps=args.validation_steps,
        num_validation_images=args.num_validation_images,
    )


if __name__ == "__main__":
    main()
