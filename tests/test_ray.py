"""near_far_from_aabb vs analytic slab math (raymarching.cu:92-145)."""

import jax.numpy as jnp
import numpy as np

from customnerf_tpu.ops.ray import near_far_from_aabb

AABB = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def test_axis_ray_hits():
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, AABB, 0.05)
    np.testing.assert_allclose(np.asarray(near), [2.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(far), [4.0], rtol=1e-6)


def test_inside_origin_clamps_to_min_near():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    near, far = near_far_from_aabb(o, d, AABB, 0.05)
    np.testing.assert_allclose(np.asarray(near), [0.05])
    np.testing.assert_allclose(np.asarray(far), [1.0], rtol=1e-6)


def test_miss_gives_flt_max():
    o = jnp.asarray([[0.0, 5.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, AABB, 0.05)
    assert np.asarray(near)[0] > 1e30
    assert np.asarray(far)[0] > 1e30


def test_diagonal_ray():
    o = jnp.asarray([[-2.0, -2.0, -2.0]])
    d = jnp.asarray([[1.0, 1.0, 1.0]]) / np.sqrt(3)
    near, far = near_far_from_aabb(o, d, AABB, 0.05)
    np.testing.assert_allclose(np.asarray(near), [np.sqrt(3)], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(far), [3 * np.sqrt(3)], rtol=1e-5)


def test_random_rays_consistent_with_numpy():
    rng = np.random.RandomState(0)
    o = rng.randn(128, 3).astype(np.float32) * 2
    d = rng.randn(128, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), AABB, 0.05)
    near, far = np.asarray(near), np.asarray(far)

    # numpy slab reference
    t0 = (np.asarray(AABB[:3]) - o) / d
    t1 = (np.asarray(AABB[3:]) - o) / d
    lo = np.minimum(t0, t1).max(-1)
    hi = np.maximum(t0, t1).min(-1)
    miss = lo > hi
    lo = np.maximum(lo, 0.05)
    hit = ~miss
    np.testing.assert_allclose(near[hit], lo[hit], rtol=1e-4)
    np.testing.assert_allclose(far[hit], hi[hit], rtol=1e-4)
    assert np.all(near[miss] > 1e30)
