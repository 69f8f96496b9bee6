"""steps_per_dispatch: scan-of-steps must match the step-per-dispatch loop."""

import jax
import numpy as np

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer

import pytest

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)


def _cfg(ws, **kw):
    return Config(data_type="synthetic", workspace=ws, iters=400, lr=1e-2,
                  num_steps=8, upsample_steps=0, train_size=4, soft_mask=True,
                  grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
                  grid_base_resolution=4, use_ckpt="scratch", **kw)


def test_scan_matches_loop(tmp_path):
    opt_a = _cfg(str(tmp_path / "a"))
    opt_b = _cfg(str(tmp_path / "b"), steps_per_dispatch=4)

    tr_a = Trainer("df", opt_a, use_checkpoint="scratch")
    tr_b = Trainer("df", opt_b, use_checkpoint="scratch")

    loader = NeRFDataset(opt_a, type="train").dataloader()
    batches = [loader.item(i) for i in range(4)]
    keys = [jax.random.PRNGKey(i) for i in range(4)]

    for b, k in zip(batches, keys):
        tr_a.train_step(b, k)

    tr_b.train_many(batches, keys)

    for a, b in zip(jax.tree_util.tree_leaves(tr_a.params),
                    jax.tree_util.tree_leaves(tr_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_epoch_with_scan_runs(tmp_path):
    opt = _cfg(str(tmp_path / "c"), steps_per_dispatch=3)
    tr = Trainer("df", opt, use_checkpoint="scratch")
    loader = NeRFDataset(opt, type="train").dataloader()
    tr.epoch = 1
    tr.train_one_epoch(loader)
    assert tr.global_step == 4
    assert len(tr.stats["loss"]) == 1
    assert np.isfinite(tr.stats["loss"][0])


def test_scan_under_mesh_matches_single_device(tmp_path):
    """steps_per_dispatch × mesh: the scanned multi-step dispatch with rays
    sharded across the data axis must equal the unsharded scan."""
    opt_a = _cfg(str(tmp_path / "m1"), steps_per_dispatch=3)
    opt_b = _cfg(str(tmp_path / "m2"), steps_per_dispatch=3,
                 mesh_shape="data:8")

    tr_a = Trainer("df", opt_a, use_checkpoint="scratch")
    tr_b = Trainer("df", opt_b, use_checkpoint="scratch")
    assert tr_b.mesh is not None

    loader = NeRFDataset(opt_a, type="train").dataloader()
    batches = [loader.item(i) for i in range(3)]
    keys = [jax.random.PRNGKey(i) for i in range(3)]

    tr_a.train_many(batches, keys)
    tr_b.train_many(batches, keys)

    # Adam(eps=1e-15) amplifies sharded-psum reduction-order noise on a few
    # near-zero-v elements; a sharding BUG diverges wholesale, not at 1e-3.
    for a, b in zip(jax.tree_util.tree_leaves(tr_a.params),
                    jax.tree_util.tree_leaves(tr_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-5)
