"""Editing under the device mesh (VERDICT r1 missing #4 / next #5):
ray-sharded single-scene step ≡ single-device, and the batched multi-scene
step (BASELINE config 5) on a scene×data mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer
from test_editing import TinyGuidance


def _opt(ws, **kw):
    base = dict(
        data_type="synthetic", workspace=ws, iters=100, lr=5e-3,
        num_steps=8, upsample_steps=4, train_size=4, soft_mask=True,
        pretrained=True, lambda_sd=0.01, keep_bg=10.0, cfg=100.0,
        random_bg_c=True, detach_bg=True,
        text="a corgi in a forest", text_fg="a corgi",
        grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
        grid_base_resolution=4, use_ckpt="scratch",
    )
    base.update(kw)
    return Config(**base)


def _patched(monkey):
    """Patch the 512² SDS resize to 64² so the tiny VAE stays tiny."""
    orig = jax.image.resize

    def small_resize(x, shape, method="bilinear", **kw):
        if len(shape) == 4 and shape[1] == 512:
            shape = (shape[0], 64, 64, shape[3])
        return orig(x, shape, method=method, **kw)

    monkey.setattr(jax.image, "resize", small_resize)


def _make_trainer(ws, mesh_shape=""):
    opt = _opt(ws, mesh_shape=mesh_shape)
    guidance = TinyGuidance(opt)
    return Trainer("df", opt, guidance=guidance, use_checkpoint="scratch")


def test_sharded_editing_step_matches_single_device(tmp_path, monkeypatch):
    import customnerf_tpu.engine.editing as ed

    _patched(monkeypatch)
    t_single = _make_trainer(str(tmp_path / "a"))
    t_mesh = _make_trainer(str(tmp_path / "b"), mesh_shape="data:8")
    assert t_mesh.mesh is not None

    loader = NeRFDataset(t_single.opt, type="train").dataloader()
    batch = loader.item(0)

    for t in (t_single, t_mesh):
        t.global_step = 1
        ed.editing_step(t, batch, jax.random.PRNGKey(7))

    flat_a = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, t_single.params))
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, t_mesh.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_multi_scene_editing_step(tmp_path, monkeypatch):
    """Two scenes stacked on a scene:2 × data:4 mesh update independently in
    one batched step, and sharding does not change the math."""
    import customnerf_tpu.engine.editing as ed

    _patched(monkeypatch)
    trainer = _make_trainer(str(tmp_path / "m"), mesh_shape="scene:2,data:4")
    loader = NeRFDataset(trainer.opt, type="train").dataloader()
    batches = [loader.item(0), loader.item(1)]

    params_s = ed.stack_trees([trainer.params, trainer.params])
    opt_state_s = ed.stack_trees([trainer.opt_state, trainer.opt_state])
    trainer.global_step = 1

    p1, o1, losses, aux = ed.editing_step_scenes(
        trainer, batches, params_s, opt_state_s, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(losses)).all() and losses.shape == (2,)
    assert np.isfinite(np.asarray(aux["loss_sds"])).all()

    # each scene's params moved, and differently (different views/noise)
    before = jax.tree_util.tree_leaves(params_s)
    after = jax.tree_util.tree_leaves(p1)
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(after, before))
    assert moved > 0.0
    table = np.asarray(p1["params"]["grid_table"])
    assert np.abs(table[0] - table[1]).max() > 0.0

    # sharding-independence: same step on a fresh trainer without a mesh
    trainer2 = _make_trainer(str(tmp_path / "m2"), mesh_shape="")
    trainer2.global_step = 1
    params_s2 = ed.stack_trees([trainer2.params, trainer2.params])
    opt_state_s2 = ed.stack_trees([trainer2.opt_state, trainer2.opt_state])
    p2, _, losses2, _ = ed.editing_step_scenes(
        trainer2, batches, params_s2, opt_state_s2, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses2),
                               rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_editing_step_honors_occupancy_fast_path(tmp_path, monkeypatch):
    """-O editing: the editing render must go through render_rays_fast with
    the trainer's occupancy state (VERDICT r1 weak #5)."""
    import customnerf_tpu.engine.editing as ed

    _patched(monkeypatch)
    opt = _opt(str(tmp_path / "o"), cuda_ray=True)
    from test_editing import TinyGuidance
    trainer = Trainer("df", opt, guidance=TinyGuidance(opt),
                      use_checkpoint="scratch")
    assert trainer.occ_state is not None
    loader = NeRFDataset(opt, type="train").dataloader()

    p_before = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.global_step = 1
    loss, aux = ed.editing_step(trainer, loader.item(0), jax.random.PRNGKey(5))
    assert np.isfinite(float(aux["loss_sds"]))
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.params, p_before)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0
