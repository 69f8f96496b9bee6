"""Grid encoder vs a slow NumPy oracle + gradient sanity.

The oracle re-derives the reference CUDA semantics
(gridencoder/src/gridencoder.cu:88-244) independently in NumPy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.ops.grid import (
    GridSpec,
    grid_encode,
    grid_encode_reference_dense,
    grid_init,
)


@pytest.fixture(scope="module")
def small_specs():
    return {
        "tiled": GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                          log2_hashmap_size=8, desired_resolution=32,
                          gridtype="tiled"),
        "hash": GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                         log2_hashmap_size=8, desired_resolution=32,
                         gridtype="hash"),
    }


@pytest.mark.parametrize("kind", ["tiled", "hash"])
def test_matches_numpy_oracle(small_specs, kind):
    spec = small_specs[kind]
    key = jax.random.PRNGKey(0)
    table = grid_init(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    got = np.asarray(grid_encode(x, table, spec))
    want = grid_encode_reference_dense(np.asarray(x), np.asarray(table), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_out_of_bounds_is_zero(small_specs):
    spec = small_specs["tiled"]
    table = grid_init(jax.random.PRNGKey(0), spec)
    x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = grid_encode(x, table, spec)
    assert np.allclose(np.asarray(out), 0.0)


def test_offsets_match_reference_formula():
    # bear config: tiledgrid 16 levels, log2 21, desired 8192 (network_grid.py:89-96)
    spec = GridSpec(num_levels=16, level_dim=2, base_resolution=16,
                    log2_hashmap_size=21, desired_resolution=8192,
                    gridtype="tiled")
    meta = spec.level_meta
    # reproduce gridencoder/grid.py:127-133 independently
    pls = np.exp2(np.log2(8192 / 16) / 15)
    offset = 0
    for i in range(16):
        res = int(np.ceil(16 * pls ** i))
        params = min(2 ** 21, (res + 1) ** 3)
        params = int(np.ceil(params / 8) * 8)
        assert meta["sizes"][i] == params
        assert meta["offsets"][i] == offset
        offset += params
    assert spec.table_size == offset
    assert spec.output_dim == 32


def test_gradients_flow_and_are_local(small_specs):
    spec = small_specs["tiled"]
    table = grid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 3), minval=0.1, maxval=0.9)

    def loss(tab):
        return jnp.sum(grid_encode(x, tab, spec) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    # only gathered corners receive gradient
    assert np.count_nonzero(np.asarray(g)) > 0
    assert np.count_nonzero(np.asarray(g)) < g.size

    # gradient wrt inputs exists too (trilinear weights are differentiable)
    gx = jax.grad(lambda xx: jnp.sum(grid_encode(xx, table, spec)))(x)
    assert np.all(np.isfinite(np.asarray(gx)))


def test_jit_and_vmap_compatible(small_specs):
    spec = small_specs["hash"]
    table = grid_init(jax.random.PRNGKey(0), spec)
    f = jax.jit(lambda x: grid_encode(x, table, spec))
    x = jax.random.uniform(jax.random.PRNGKey(3), (32, 3))
    out = f(x)
    assert out.shape == (32, spec.output_dim)
    out2 = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
