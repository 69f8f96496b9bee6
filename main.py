"""TPU-native CustomNeRF CLI — flag-compatible with the reference main.py
(hrz2000/CustomNeRF ``main.py:11-198``): the two-phase bear recipe
(``scripts/bear.sh``) runs unchanged.

Modes:
  * default       — train reconstruction (or LGIE editing with --pretrained),
                    then render the test path.
  * --test        — load a checkpoint and render the test path only.
"""

from __future__ import annotations

import os

import numpy as np

from customnerf_tpu.config import parse_args


def _honor_platform_env():
    """The axon TPU plugin overrides jax_platforms at import time; re-assert
    the user's JAX_PLATFORMS so `JAX_PLATFORMS=cpu python main.py` works.
    Also enable the persistent compilation cache — first compiles through the
    TPU tunnel cost minutes and are fully reusable across runs."""
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        if "cpu" not in want:
            # keep the host cpu backend available (big-model init runs there)
            want = f"{want},cpu"
        jax.config.update("jax_platforms", want)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/customnerf_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer, max_epochs_for


def main():
    _honor_platform_env()
    opt = parse_args()
    np.random.seed(opt.seed)

    from customnerf_tpu.parallel.mesh import init_distributed
    if init_distributed():  # multi-host (env-configured); single-host no-op
        import jax
        print(f"[INFO] jax.distributed up: process {jax.process_index()}"
              f"/{jax.process_count()}, {len(jax.devices())} global devices")

    if opt.validate_weights:
        from customnerf_tpu.guidance.validate import validate_weights
        report = validate_weights(opt)
        raise SystemExit(0 if report["ok"] else 1)

    if opt.test:
        trainer = Trainer("df", opt, workspace=opt.workspace,
                          use_checkpoint=opt.ckpt)
        test_loader = NeRFDataset(opt, type="test", H=opt.H, W=opt.W,
                                  size=1000, R_path=opt.R_path).dataloader()
        trainer.test(test_loader, split="test")
        return

    guidance = None
    if opt.pretrained and opt.lambda_sd:
        from customnerf_tpu.guidance.sds import StableDiffusionGuidance
        guidance = StableDiffusionGuidance(opt)

    trainer = Trainer("df", opt, guidance=guidance, workspace=opt.workspace,
                      use_checkpoint=opt.ckpt)

    train_loader = NeRFDataset(opt, type="train", H=opt.h, W=opt.w,
                               size=500, R_path=opt.R_path).dataloader()
    valid_loader = NeRFDataset(opt, type="val", H=opt.H, W=opt.W,
                               size=10, R_path=opt.R_path).dataloader()

    max_epoch = max_epochs_for(opt, len(train_loader))
    trainer.train(train_loader, valid_loader, max_epoch)

    test_loader = NeRFDataset(opt, type="test", H=opt.H, W=opt.W,
                              size=100, R_path=opt.R_path).dataloader()
    trainer.test(test_loader, split="test")


if __name__ == "__main__":
    main()
