"""A/B the --eval_march_candidates budget on a TRAINED checkpoint.

Renders the same val frames at the reference-parity eval march budget
(max_steps=1024 candidates/ray) and at coarser budgets, reporting eval
PSNR and per-frame wall for each — the quality gate for adopting a
coarser (faster) eval march (docs/PERF.md "Full-run wall time").  Pure
inference: no retraining, runs in ~2 min on chip against the workspace's
latest checkpoint.

Usage: python scripts/eval_march_ab.py [workspace] [budget ...]
Reference surface being varied: the CUDA march's max_steps inference
budget (raymarching.cu:345-346 via nerf/renderer.py:623-626).
"""
import os
import sys
import time

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/customnerf_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from customnerf_tpu.config import parse_args
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer

WS = sys.argv[1] if len(sys.argv) > 1 else "outputs/bear_recon_r3c"
BUDGETS = [int(a) for a in sys.argv[2:]] or [0, 256, 128]

BASE = ["-O", "--data_type", "nerfstudio", "--data_path", "/tmp/bear_fixture",
        "--keyword", "lang_bear", "--workspace", WS,
        "--train_resolution_level", "7", "--eval_resolution_level", "4",
        "--bound", "2", "--train_conf", "0.01", "--soft_mask",
        "--grid_type", "triplane", "--triplane_res", "128", "512",
        "--triplane_channels", "16", "8",
        "--num_steps", "40", "--upsample_steps", "0",
        "--compact_frac", "0.4", "--compact_block", "32",
        "--ckpt", "latest"]


def main():
    for cand in BUDGETS:
        opt = parse_args(BASE + ["--eval_march_candidates", str(cand)])
        t = Trainer("df", opt, use_checkpoint="latest")
        loader = NeRFDataset(opt, type="val").dataloader()
        psnrs, walls = [], []
        for i, b in enumerate(loader):
            if i >= 4:
                break
            t0 = time.perf_counter()
            out = t.render_image(b.rays_o, b.rays_d)
            img = np.asarray(out["image"])  # materialize = device sync
            walls.append(time.perf_counter() - t0)
            gt = np.asarray(b.rgbs)
            mse = float(np.mean((img - gt) ** 2))
            psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        tag = cand or "parity(1024)"
        steady = np.mean(walls[1:]) if len(walls) > 1 else walls[0]
        print(f"candidates={tag}: PSNR {np.mean(psnrs):.3f} dB "
              f"{[round(p, 2) for p in psnrs]}  wall/frame {steady:.2f}s "
              f"(first {walls[0]:.1f}s)")


if __name__ == "__main__":
    main()
