"""Editing-quality regression gate (VERDICT r3 #8).

All SDS/LGIE math is bit-equality tested elsewhere; this module pins the
*outcome* of a short editing run on the synthetic fixture with the tiny
guidance stack, so future perf work on the editing path (compaction,
fused-scan changes, remat policies) trips a semantic wire, not just
step-1 bit-equality:

  * keep_bg keeps working: the background-L1 against the frozen pretrained
    render DECREASES over the run and ends small;
  * the edit is LOCALIZED: foreground pixels move much more than
    background pixels (detach_bg + keep_bg + bg fill doing their jobs);
  * the learned confidence mask does not collapse (IoU with the pre-edit
    mask stays high).

Random SD weights make the SDS direction noise, but the LGIE machinery's
background-preservation contract is weight-independent — exactly the part
a perf regression would silently break.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer
from test_editing import TinyGuidance

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)

_COMMON = dict(
    data_type="synthetic", num_steps=8, upsample_steps=4, soft_mask=True,
    grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
    grid_base_resolution=4,
)


@pytest.fixture(scope="module")
def pretrained_ckpt(tmp_path_factory):
    """Short reconstruction so editing starts from a real field (a scratch
    field is opaque fog and the bg metrics would be vacuous)."""
    import glob
    ws = str(tmp_path_factory.mktemp("gate_recon"))
    opt = Config(workspace=ws, iters=60, lr=1e-2, train_size=20,
                 use_ckpt="scratch", train_conf=0.1, **_COMMON)
    trainer = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()
    for _ in range(3):
        trainer.train_one_epoch(loader)
        trainer.epoch += 1
    trainer.save_checkpoint(full=False)
    return sorted(glob.glob(f"{ws}/checkpoints/df_ep*.pth"))[-1]


def _small_resize_patch(monkeypatch):
    orig = jax.image.resize

    def small_resize(x, shape, method="bilinear", **kw):
        if len(shape) == 4 and shape[1] == 512:
            shape = (shape[0], 64, 64, shape[3])
        return orig(x, shape, method=method, **kw)

    monkeypatch.setattr(jax.image, "resize", small_resize)


def test_editing_gate_bg_preserved_fg_edited(pretrained_ckpt, tmp_path,
                                             monkeypatch):
    import customnerf_tpu.engine.editing as ed
    from customnerf_tpu.models.renderer import render_rays

    _small_resize_patch(monkeypatch)
    opt = Config(
        workspace=str(tmp_path), iters=40, lr=5e-3, train_size=4,
        pretrained=True, lambda_sd=0.1, keep_bg=10.0, cfg=100.0,
        random_bg_c=True, detach_bg=True, editing_from=pretrained_ckpt,
        text="a corgi in a forest", text_fg="a corgi",
        use_ckpt="scratch", **_COMMON)
    trainer = Trainer("df", opt, guidance=TinyGuidance(opt),
                      use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()

    batch0 = loader.item(0)
    rays_o = jnp.asarray(batch0.rays_o.reshape(-1, 3))
    rays_d = jnp.asarray(batch0.rays_d.reshape(-1, 3))

    def frame(params):
        out = render_rays(trainer.field, params, rays_o, rays_d,
                          jax.random.PRNGKey(0), trainer.settings)
        return (np.asarray(out["image"]),
                np.asarray(out["render_mask"][..., 0]),
                np.asarray(out["bg"]["image"]))

    img0, mask0, _ = frame(trainer.params)
    _, _, pt_bg = frame(trainer.params_pretrained)

    bg_losses = []
    for i in range(40):
        trainer.global_step = i + 1
        batch = loader.item(i % len(loader))
        _, aux = ed.editing_step(trainer, batch, jax.random.PRNGKey(100 + i))
        bg_losses.append(float(aux["loss_bg"]))

    img1, mask1, bg1 = frame(trainer.params)

    # 1) keep_bg trajectory: the mean over the last 10 steps beats the mean
    # over the first 10 (the loss is stochastic in bg color per step)
    assert np.mean(bg_losses[-10:]) < np.mean(bg_losses[:10]), bg_losses

    # 2) the background composite stays pinned to the frozen pretrained bg
    bg_l1 = float(np.abs(bg1 - pt_bg).mean())
    assert bg_l1 < 0.08, bg_l1

    # 3) the edit is localized: fg pixels moved ≥2× more than bg pixels
    fg_px = mask0 > 0.5
    assert fg_px.any() and (~fg_px).any()
    delta = np.abs(img1 - img0).mean(-1)
    fg_delta, bg_delta = delta[fg_px].mean(), delta[~fg_px].mean()
    assert fg_delta > 2.0 * bg_delta, (fg_delta, bg_delta)

    # 4) the confidence mask does not collapse or bleed
    inter = ((mask0 > 0.5) & (mask1 > 0.5)).sum()
    union = ((mask0 > 0.5) | (mask1 > 0.5)).sum()
    iou = inter / max(union, 1)
    assert iou > 0.5, iou
