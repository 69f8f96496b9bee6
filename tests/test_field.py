"""Field model: shapes, variants, activations, trunc_exp semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from customnerf_tpu.models.field import FieldConfig, NeRFField
from customnerf_tpu.ops.activations import trunc_exp
from customnerf_tpu.ops.frequency import freq_encode, freq_encode_dim
from customnerf_tpu.ops.grid import GridSpec

SMALL_GRID = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                      log2_hashmap_size=8, desired_resolution=32, gridtype="tiled")


def make_field(**kw):
    cfg = FieldConfig(grid=SMALL_GRID, **kw)
    field = NeRFField(cfg)
    params = field.init_params(jax.random.PRNGKey(0))
    return field, params


def test_trunc_exp_forward_backward():
    x = jnp.asarray([-20.0, 0.0, 5.0, 20.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(np.asarray(y), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    # grad is exp(clip(x, -15, 15)) — bounded
    np.testing.assert_allclose(
        np.asarray(g), np.exp(np.clip(np.asarray(x), -15, 15)), rtol=1e-5
    )
    assert abs(np.asarray(g)[-1] - np.float32(np.exp(15.0))) / np.exp(15.0) < 1e-5


def test_freq_encode_dim_and_layout():
    assert freq_encode_dim(4) == 27
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    out = np.asarray(freq_encode(x, 4))
    assert out.shape == (1, 27)
    np.testing.assert_allclose(out[0, :3], [0.1, 0.2, 0.3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, 0.2, 0.3]), rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.1, 0.2, 0.3]), rtol=1e-5)
    np.testing.assert_allclose(out[0, -3:], np.cos(8 * np.asarray([0.1, 0.2, 0.3])), rtol=1e-5)


def test_fused_head_shapes():
    field, params = make_field()
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    sigma, radiance = field.apply(params, x, d)
    assert sigma.shape == (32,)
    assert radiance.shape == (32, 4)  # rgb + 1 conf channel
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(radiance) >= 0) & (np.asarray(radiance) <= 1))


def test_density_only_matches_fused():
    field, params = make_field()
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    d = jnp.zeros((16, 3))
    sigma_fused, _ = field.apply(params, x, d)
    sigma_only = field.apply(params, x, method=field.density)
    np.testing.assert_allclose(np.asarray(sigma_fused), np.asarray(sigma_only), rtol=1e-5)


def test_gaussian_blob_dominates_at_center():
    field, params = make_field()
    center = jnp.zeros((1, 3))
    edge = jnp.ones((1, 3)) * 1.9
    s_center = field.apply(params, center, method=field.density)
    s_edge = field.apply(params, edge, method=field.density)
    # with near-zero init MLP outputs, sigma(center) ≈ exp(5) and sigma(edge) ≈ 1
    assert float(s_center[0]) > 50.0
    assert float(s_edge[0]) < 5.0


def test_mask_no_dir_variant_stops_gradient():
    field, params = make_field(mask_no_dir=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))

    def conf_loss(p):
        _, radiance = field.apply(p, x, d)
        return jnp.sum(radiance[..., 3:])

    g = jax.grad(conf_loss)(params)
    # conf flows into conf_net weights but NOT into feature_net (detached)
    g_feat = jax.tree_util.tree_leaves(g["params"]["feature_net"])
    g_conf = jax.tree_util.tree_leaves(g["params"]["conf_net"])
    assert all(np.allclose(np.asarray(t), 0) for t in g_feat)
    assert any(np.any(np.asarray(t) != 0) for t in g_conf)


def test_detach_mask_from_field_variant():
    field, params = make_field(detach_mask_from_field=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    sigma, radiance = field.apply(params, x, d)
    assert radiance.shape == (8, 4)

    def conf_loss(p):
        _, r = field.apply(p, x, d)
        return jnp.sum(r[..., 3:])

    g = jax.grad(conf_loss)(params)
    g_rgb = jax.tree_util.tree_leaves(g["params"]["rgb_net"])
    assert all(np.allclose(np.asarray(t), 0) for t in g_rgb)


def test_no_conf_variant():
    field, params = make_field(train_conf=False)
    x = jnp.zeros((4, 3))
    d = jnp.zeros((4, 3))
    _, radiance = field.apply(params, x, d)
    assert radiance.shape == (4, 3)


def test_bf16_compute_dtype_runs():
    field, params = make_field(compute_dtype="bfloat16")
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    sigma, radiance = field.apply(params, x, d)
    assert sigma.dtype == jnp.float32  # outputs promoted back
    assert np.all(np.isfinite(np.asarray(sigma)))
