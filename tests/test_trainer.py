"""Trainer end-to-end on the synthetic scene: loss falls, PSNR rises,
checkpoints ring-buffer and round-trip (the integration test the reference
never had — SURVEY.md §4)."""

import glob
import os

import jax
import numpy as np
import pytest

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer, max_epochs_for

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)


@pytest.fixture(scope="module")
def tiny_opt(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws"))
    return Config(
        data_type="synthetic", workspace=ws, iters=400, lr=1e-2, num_steps=12,
        upsample_steps=4, train_size=8, soft_mask=True, eval_interval=100,
        grid_levels=6, log2_hashmap_size=12, desired_resolution=64,
        grid_base_resolution=4, max_ray_batch=4096, use_ckpt="scratch",
    )


@pytest.fixture(scope="module")
def trained(tiny_opt):
    trainer = Trainer("df", tiny_opt, use_checkpoint="scratch")
    train_loader = NeRFDataset(tiny_opt, type="train").dataloader()
    losses = []
    key = jax.random.PRNGKey(0)
    first_batch = None
    for epoch in range(5):
        trainer.epoch = epoch + 1
        for batch in train_loader:
            if first_batch is None:
                first_batch = batch
            trainer.global_step += 1
            key, sub = jax.random.split(key)
            loss, _ = trainer.train_step(batch, sub)
            losses.append(float(loss))
    return trainer, losses, first_batch


def test_loss_decreases(trained):
    _, losses, _ = trained
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses


def test_render_image_chunked_matches_unchunked(trained):
    trainer, _, batch = trained
    out = trainer.render_image(batch.rays_o, batch.rays_d)
    assert out["image"].shape == (batch.H * batch.W, 3)
    # PSNR vs gt should beat a grey image after training
    mse = float(np.mean((np.asarray(out["image"]) - np.asarray(batch.rgbs)) ** 2))
    grey = float(np.mean((0.5 - np.asarray(batch.rgbs)) ** 2))
    assert mse < grey

    # multi-chunk on-device loop (lax.map rows + tail padding) must render
    # the same frame: a chunk that doesn't divide N exercises both
    opt = trainer.opt
    old_chunk, old_fns = opt.max_ray_batch, trainer._compiled.pop(
        "render_frame", None)
    try:
        opt.max_ray_batch = 100  # N=4096 → 41 rows of 100 + pad
        out_multi = trainer.render_image(batch.rays_o, batch.rays_d)
    finally:
        opt.max_ray_batch = old_chunk
        if old_fns is not None:
            trainer._compiled["render_frame"] = old_fns
    np.testing.assert_allclose(np.asarray(out_multi["image"]),
                               np.asarray(out["image"]),
                               rtol=2e-5, atol=2e-6)


def test_checkpoint_roundtrip(trained, tiny_opt):
    trainer, _, batch = trained
    trainer.save_checkpoint()
    ckpts = glob.glob(os.path.join(trainer.ckpt_path, "*.pth"))
    assert ckpts

    img_before = np.asarray(trainer.render_image(batch.rays_o, batch.rays_d)["image"])

    opt2 = tiny_opt.replace(use_ckpt="latest")
    trainer2 = Trainer("df", opt2)
    assert trainer2.global_step == trainer.global_step
    img_after = np.asarray(trainer2.render_image(batch.rays_o, batch.rays_d)["image"])
    np.testing.assert_allclose(img_before, img_after, atol=1e-5)


def test_checkpoint_is_torch_loadable(trained):
    """On-disk contract: torch.load sees epoch/global_step/model keys
    (SURVEY.md §5.4)."""
    import torch
    trainer, _, _ = trained
    path = sorted(glob.glob(os.path.join(trainer.ckpt_path, "*.pth")))[-1]
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert {"epoch", "global_step", "stats", "model"} <= set(ckpt.keys())
    assert any("grid_table" in k for k in ckpt["model"])
    assert all(isinstance(v, torch.Tensor) for v in ckpt["model"].values())


def test_ring_buffer_prunes(tmp_path):
    opt = Config(data_type="synthetic", workspace=str(tmp_path), iters=10,
                 max_keep_ckpt=2, use_ckpt="scratch", grid_levels=4,
                 log2_hashmap_size=10, desired_resolution=32,
                 grid_base_resolution=4)
    trainer = Trainer("df", opt)
    for ep in [1, 2, 3, 4]:
        trainer.epoch = ep
        trainer.save_checkpoint()
    files = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(trainer.ckpt_path, "*.pth")))
    # ring keeps last 2 (+ anything ending in 0.pth is spared — none here <10)
    assert len(files) == 2
    assert files == ["df_ep0003.pth", "df_ep0004.pth"]


def test_eval_and_test_write_outputs(trained, tiny_opt):
    trainer, _, _ = trained
    val_loader = NeRFDataset(tiny_opt, type="val").dataloader()
    trainer.evaluate_one_epoch(val_loader)
    strips = glob.glob(os.path.join(trainer.workspace, "validation", "*.png"))
    assert strips

    test_loader = NeRFDataset(tiny_opt, type="test").dataloader()
    trainer.test(test_loader, split="test")
    frames = glob.glob(os.path.join(trainer.workspace, "results", "*", "*.png"))
    assert frames
    videos = glob.glob(os.path.join(trainer.workspace, "results", "*.mp4"))
    assert videos


class _StubCLIPMatcher:
    """Deterministic stand-in for CLIPViewMatcher: image embed = normalized
    mean RGB, text embed = fixed per-prompt unit vector."""

    def image_embeds(self, imgs):
        v = np.asarray(imgs, np.float64).mean(axis=(1, 2))  # [B, 3]
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    def text_embeds(self, prompts):
        import zlib
        out = []
        for p in prompts:
            rs = np.random.RandomState(zlib.crc32(p.encode()) % (2 ** 31))
            v = rs.randn(3)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)


def test_clip_metrics_reported_in_test(trained, tiny_opt):
    """--clip_metrics: trainer.test computes CLIP score over rendered frames
    and writes {name}_clip_metrics.json (ROADMAP framework #2)."""
    import json

    trainer, _, _ = trained
    test_loader = NeRFDataset(tiny_opt, type="test").dataloader()
    old = (tiny_opt.clip_metrics, tiny_opt.clip_ref_text, tiny_opt.text)
    trainer.clip_matcher = _StubCLIPMatcher()
    try:
        tiny_opt.clip_metrics = True
        tiny_opt.text = "a red cube"
        trainer.test(test_loader, split="clipm")
        paths = glob.glob(os.path.join(trainer.workspace, "results",
                                       "*clipm_clip_metrics.json"))
        assert paths, "clip metrics json not written"
        metrics = json.load(open(paths[0]))
        assert -1.0 <= metrics["clip_score"] <= 1.0
        assert metrics["n_views"] >= 1
        # directional needs --pretrained renders; recon run must not emit it
        assert "clip_directional" not in metrics

        # directional score path via report_clip_metrics directly
        after = np.random.RandomState(0).rand(3, 8, 8, 3)
        before = np.random.RandomState(1).rand(3, 8, 8, 3)
        tiny_opt.clip_ref_text = "a grey cube"
        m = trainer.report_clip_metrics(after, before,
                                        trainer.workspace, "dir")
        assert -1.0 <= m["clip_directional"] <= 1.0
    finally:
        (tiny_opt.clip_metrics, tiny_opt.clip_ref_text, tiny_opt.text) = old
        del trainer.clip_matcher


def test_clip_metrics_skips_without_weights(trained, tiny_opt):
    """No matcher + no --clip_weights + no --allow_random_guidance → the
    metric is skipped loudly (random CLIP scores are meaningless)."""
    trainer, _, _ = trained
    old = tiny_opt.clip_metrics
    try:
        tiny_opt.clip_metrics = True
        assert not hasattr(trainer, "clip_matcher")
        out = trainer.report_clip_metrics(
            np.zeros((1, 4, 4, 3)), None, trainer.workspace, "skip")
        assert out is None
        assert not os.path.exists(os.path.join(
            trainer.workspace, "skip_clip_metrics.json"))
    finally:
        tiny_opt.clip_metrics = old
