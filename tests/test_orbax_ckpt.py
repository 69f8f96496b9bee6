"""Orbax async checkpoint option (--ckpt_format orbax) round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from customnerf_tpu.engine import checkpoint as ckpt_io


def _tree():
    k = jax.random.PRNGKey(0)
    return {"params": {"grid_table": jax.random.normal(k, (16, 4)),
                       "mlp": {"kernel": jnp.ones((4, 8))}}}


def test_orbax_roundtrip(tmp_path):
    params = _tree()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    stats = {"loss": [1.0, 0.5], "checkpoints": ["df_ep0001.orbax"]}

    saver = ckpt_io.OrbaxSaver()
    path = str(tmp_path / "df_ep0001.orbax")
    saver.save(path, params, epoch=1, global_step=42, stats=stats,
               opt_state=opt_state, extra={"mean_density": 3.5})
    saver.wait()
    assert os.path.isdir(path)

    got, meta = ckpt_io.load_checkpoint_orbax(path, opt_state)
    np.testing.assert_array_equal(np.asarray(got["params"]["grid_table"]),
                                  np.asarray(params["params"]["grid_table"]))
    assert meta["epoch"] == 1 and meta["global_step"] == 42
    assert meta["stats"]["loss"] == [1.0, 0.5]
    assert float(meta["mean_density"]) == 3.5
    # optimizer state restored with identical structure + values
    for a, b in zip(jax.tree_util.tree_leaves(meta["opt_state"]),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_sees_orbax(tmp_path):
    saver = ckpt_io.OrbaxSaver()
    for ep in (1, 2):
        saver.save(str(tmp_path / f"df_ep{ep:04d}.orbax"), _tree(),
                   epoch=ep, global_step=ep, stats={})
    saver.wait()
    assert ckpt_io.latest_checkpoint(str(tmp_path)).endswith("df_ep0002.orbax")


def test_ring_prunes_orbax_dirs_sparing_0(tmp_path):
    saver = ckpt_io.OrbaxSaver()
    stats = {"checkpoints": []}
    for ep in range(9, 13):   # df_ep0009..0012; 0010 must be spared
        name = f"df_ep{ep:04d}.orbax"
        saver.save(str(tmp_path / name), _tree(), epoch=ep, global_step=ep,
                   stats={})
        stats["checkpoints"].append(name)
    saver.wait()
    ckpt_io.prune_ring(stats, str(tmp_path), max_keep=2)
    names = sorted(os.listdir(tmp_path))
    assert "df_ep0009.orbax" not in names        # pruned
    assert "df_ep0010.orbax" in names            # *0 spared
    assert "df_ep0011.orbax" in names and "df_ep0012.orbax" in names


def test_trainer_orbax_save_load(tmp_path):
    from customnerf_tpu.config import Config
    from customnerf_tpu.engine.trainer import Trainer

    opt = Config(data_type="synthetic", workspace=str(tmp_path / "ws"),
                 iters=10, num_steps=8, upsample_steps=0, train_size=2,
                 grid_levels=2, log2_hashmap_size=10, desired_resolution=16,
                 grid_base_resolution=4, use_ckpt="scratch",
                 ckpt_format="orbax")
    t = Trainer("df", opt, use_checkpoint="scratch")
    t.epoch = 3
    t.global_step = 7
    t.save_checkpoint(full=True)
    t._orbax_saver.wait()
    path = ckpt_io.latest_checkpoint(t.ckpt_path)
    assert path and path.endswith("df_ep0003.orbax")

    t2 = Trainer("df", opt, use_checkpoint="scratch")
    t2._load(path)
    assert t2.epoch == 3 and t2.global_step == 7
    for a, b in zip(jax.tree_util.tree_leaves(t2.params),
                    jax.tree_util.tree_leaves(t.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
