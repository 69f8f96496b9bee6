"""Sharding: mesh construction, sharded train step on the 8-device CPU mesh,
and the driver-facing dryrun_multichip entry."""

import jax
import numpy as np
import pytest

from customnerf_tpu.parallel.mesh import make_mesh, pad_to_multiple, replicate, shard_batch

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)


def test_make_mesh_specs():
    assert make_mesh("") is None
    m = make_mesh("data:8")
    assert m.devices.shape == (8,)
    assert m.axis_names == ("data",)
    m2 = make_mesh("scene:2,data:4")
    assert m2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh("data:999")


def test_pad_to_multiple():
    import jax.numpy as jnp
    x = jnp.ones((10, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3)
    assert n == 10
    y, n2 = pad_to_multiple(jnp.ones((16, 3)), 8)
    assert y.shape == (16, 3)


def test_sharded_batch_placement():
    import jax.numpy as jnp
    mesh = make_mesh("data:8")
    x = jnp.arange(32.0).reshape(32, 1)
    sx = shard_batch(mesh, x)
    assert sx.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sx), np.asarray(x))


def test_dryrun_multichip_entry():
    """The exact function the driver runs (8 virtual CPU devices)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_train_step_matches_single_device():
    """Gradient math must be identical whether rays are sharded or not."""
    import jax.numpy as jnp
    import optax
    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays
    from customnerf_tpu.ops.grid import GridSpec

    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    field = NeRFField(FieldConfig(grid=grid))
    params = field.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(num_steps=8, upsample_steps=0, soft_mask=True)

    rng = np.random.RandomState(0)
    n = 64
    o = jnp.asarray(np.tile([[0, 0, -1.5]], (n, 1)).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32) * 0.1 + np.asarray([0, 0, 1], np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tgt = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss_fn(p, o_, d_, t_):
        out = render_rays(field, p, o_, d_, jax.random.PRNGKey(1), s)
        return jnp.mean((out["image"] - t_) ** 2)

    g_single = jax.grad(loss_fn)(params, o, d, tgt)

    mesh = make_mesh("data:8")
    params_r = replicate(mesh, params)
    o_s, d_s, t_s = shard_batch(mesh, (o, d, tgt))
    g_sharded = jax.jit(jax.grad(loss_fn))(params_r, o_s, d_s, t_s)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


def test_init_distributed_single_host_noop(monkeypatch):
    """No coordinator configured → clean no-op (returns False)."""
    from customnerf_tpu.parallel.mesh import init_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_make_mesh_topology_aware():
    """Full-device meshes go through mesh_utils.create_device_mesh; subsets
    still work via reshape."""
    from customnerf_tpu.parallel.mesh import make_mesh
    m = make_mesh("scene:2,data:4")          # all 8 virtual devices
    assert m.axis_names == ("scene", "data") and m.devices.shape == (2, 4)
    m2 = make_mesh("data:4")                 # subset → reshape path
    assert m2.devices.shape == (4,)


def test_sharded_fast_step_with_compaction_matches_single_device():
    """The flagship compacted fast path must stay correct under the ray
    mesh: the fixed ray permutation and block matmuls cross shard
    boundaries, so XLA inserts collectives — gradients must still equal the
    single-device run (no-overflow budget → exact compaction)."""
    import jax.numpy as jnp
    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays_fast
    from customnerf_tpu.ops.grid import GridSpec
    from customnerf_tpu.ops.occupancy import init_state, state_from_grid

    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    field = NeRFField(FieldConfig(grid=grid))
    params = field.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(num_steps=8, upsample_steps=0, soft_mask=True)

    rng = np.random.RandomState(2)
    g0 = init_state(cascade=1, grid_size=16)
    dens = (rng.rand(*g0.density_grid.shape) < 0.3) * 100.0
    occ = state_from_grid(dens.astype(np.float32), 1.0, density_thresh=10.0,
                          grid_size=16)

    import jax.numpy as jnp
    n = 64
    o = jnp.asarray(np.tile([[0, 0, -1.2]], (n, 1)).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32) * 0.2 + np.asarray(
        [0, 0, 1], np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tgt = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss_fn(p, o_, d_, t_):
        out = render_rays_fast(field, p, o_, d_, occ, jax.random.PRNGKey(1),
                               s, n_coarse=16, n_keep=8, train=True,
                               compact_frac=1.0, compact_block=8)
        return jnp.mean((out["image"] - t_) ** 2)

    g_single = jax.grad(loss_fn)(params, o, d, tgt)

    mesh = make_mesh("data:8")
    params_r = replicate(mesh, params)
    o_s, d_s, t_s = shard_batch(mesh, (o, d, tgt))
    g_sharded = jax.jit(jax.grad(loss_fn))(params_r, o_s, d_s, t_s)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)
