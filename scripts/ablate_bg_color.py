"""Ablation: dense-path bg_color fill on the editing step (PARITY deviation).

The reference's ``run()`` accepts bg_color but never applies it to the
rendered pixels (its only use, ``nerf/renderer.py:451-453``, is behind an
unreachable ``if_fg`` branch), so ``--random_bg_c`` is a pixel-level no-op
there on ``-O2``.  This repo applies the evident paper intent instead:
``image = composite + (1−w_sum)·bg``.

This script measures what the choice does to the editing dynamics on the
synthetic scene with the tiny CPU guidance stack: with the fill, SDS sees a
random-colored background and has no incentive to grow density in empty
space; without it (reference behavior) empty space renders black and SDS is
free to paint it.  Reported metric: mean weights_sum over the initially
empty pixels (w_sum < 0.1 at step 0) after N editing steps, plus the final
keep_bg loss.  Results recorded in docs/PARITY.md §deviations.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ablate_bg_color.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


_COMMON = dict(
    data_type="synthetic", num_steps=8, upsample_steps=4, soft_mask=True,
    grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
    grid_base_resolution=4,
)


def pretrain_scene(steps: int = 60):
    """Short reconstruction of the synthetic scene so editing starts from a
    real field with genuinely empty background (a scratch field is opaque
    fog and makes the 'empty pixels' metric vacuous)."""
    from customnerf_tpu.config import Config
    from customnerf_tpu.data.base import NeRFDataset
    from customnerf_tpu.engine.trainer import Trainer

    opt = Config(workspace="/tmp/ablate_bg_recon", iters=steps, lr=1e-2,
                 train_size=20, use_ckpt="scratch", train_conf=0.1,
                 **_COMMON)
    trainer = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()
    for _ in range(max(1, steps // opt.train_size)):
        trainer.train_one_epoch(loader)
        trainer.epoch += 1
    trainer.save_checkpoint(full=False)
    import glob
    return sorted(glob.glob(f"{opt.workspace}/checkpoints/df_ep*.pth"))[-1]


def run_variant(fill_bg: bool, ckpt: str, steps: int = 40):
    from test_editing import TinyGuidance  # tests/ tiny CPU SD stack

    import customnerf_tpu.engine.editing as ed
    from customnerf_tpu.config import Config
    from customnerf_tpu.data.base import NeRFDataset
    from customnerf_tpu.engine.trainer import Trainer
    from customnerf_tpu.models.renderer import render_rays

    ws = f"/tmp/ablate_bg_{'fill' if fill_bg else 'nofill'}"
    opt = Config(
        workspace=ws, iters=steps, lr=5e-3, train_size=4,
        pretrained=True, lambda_sd=0.1, keep_bg=10.0, cfg=100.0,
        random_bg_c=fill_bg, detach_bg=True, editing_from=ckpt,
        text="a corgi in a forest", text_fg="a corgi",
        use_ckpt="scratch", **_COMMON,
    )
    guidance = TinyGuidance(opt)
    trainer = Trainer("df", opt, guidance=guidance, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()

    # patch the 512² SDS resize down to 64² (tiny VAE)
    orig = jax.image.resize

    def small_resize(x, shape, method="bilinear", **kw):
        if len(shape) == 4 and shape[1] == 512:
            shape = (shape[0], 64, 64, shape[3])
        return orig(x, shape, method=method, **kw)

    jax.image.resize = small_resize
    try:
        batch0 = loader.item(0)
        rays_o = jnp.asarray(batch0.rays_o.reshape(-1, 3))
        rays_d = jnp.asarray(batch0.rays_d.reshape(-1, 3))

        def empty_ws(params):
            out = render_rays(trainer.field, params, rays_o, rays_d,
                              jax.random.PRNGKey(0), trainer.settings)
            return np.asarray(out["weights_sum"])

        ws0 = empty_ws(trainer.params)
        empty = ws0 < 0.3

        last_bg = None
        for i in range(steps):
            trainer.global_step = i + 1
            batch = loader.item(i % len(loader))
            loss, aux = ed.editing_step(trainer, batch,
                                        jax.random.PRNGKey(100 + i))
            last_bg = float(aux["loss_bg"])
        ws1 = empty_ws(trainer.params)
    finally:
        jax.image.resize = orig

    return dict(
        empty_frac=float(empty.mean()),
        ws_empty_before=float(ws0[empty].mean()),
        ws_empty_after=float(ws1[empty].mean()),
        keep_bg_final=last_bg,
    )


def main():
    ckpt = pretrain_scene()
    print(f"[pretrain] checkpoint: {ckpt}", flush=True)
    for fill in (True, False):
        r = run_variant(fill, ckpt)
        name = "fill (this repo, --random_bg_c applied)" if fill else \
               "no-op (reference pixel behavior)"
        print(f"[{name}] empty_frac={r['empty_frac']:.2f} "
              f"ws_empty {r['ws_empty_before']:.4f} -> {r['ws_empty_after']:.4f} "
              f"keep_bg_final={r['keep_bg_final']:.5f}", flush=True)


if __name__ == "__main__":
    main()
