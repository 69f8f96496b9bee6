"""Native C++ data engine vs NumPy parity; morton codes; TV regularizer;
sRGB; PLY export."""

import numpy as np
import pytest

from customnerf_tpu.utils import native


def test_native_builds_and_matches_numpy_rays():
    lib = native.get_lib()
    assert lib is not None, "native dataio failed to build"
    rng = np.random.RandomState(0)
    from scipy.spatial.transform import Rotation
    c2w = np.zeros((3, 3, 4), np.float32)
    for i in range(3):
        c2w[i, :3, :3] = Rotation.random(random_state=rng).as_matrix()
        c2w[i, :3, 3] = rng.randn(3)
    o_n, d_n = native.generate_rays_pinhole(c2w, 12, 16, 50.0, 55.0, 8.0,
                                            6.0, lvl=2.0)
    o_np, d_np = native._numpy_rays(c2w, 12, 16, 50.0, 55.0, 8.0, 6.0, 2.0)
    np.testing.assert_allclose(o_n, o_np, atol=1e-5)
    np.testing.assert_allclose(d_n, d_np, atol=1e-5)


def test_native_undistort_matches_python():
    rng = np.random.RandomState(1)
    coords = rng.randn(256, 2).astype(np.float32) * 0.3
    params = np.array([0.05, -0.01, 0.001, 0.0, 0.001, -0.002], np.float32)
    got = native.undistort_fisheye(coords, params)
    from customnerf_tpu.data.camera import radial_and_tangential_undistort
    want = radial_and_tangential_undistort(
        coords.astype(np.float64), np.tile(params[None], (256, 1)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_morton_roundtrip():
    import jax.numpy as jnp
    from customnerf_tpu.ops.morton import morton3D, morton3D_invert
    rng = np.random.RandomState(0)
    coords = rng.randint(0, 1024, (128, 3))
    codes = morton3D(jnp.asarray(coords))
    back = morton3D_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), coords)
    # morton code of (1,0,0) is 1, (0,1,0) is 2, (0,0,1) is 4
    np.testing.assert_array_equal(
        np.asarray(morton3D(jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]]))),
        [1, 2, 4])


def test_sph_from_ray():
    import jax.numpy as jnp
    from customnerf_tpu.ops.morton import sph_from_ray
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    pt = sph_from_ray(o, d, 3.0)
    np.testing.assert_allclose(np.asarray(pt), [[0, 0, 3.0]], atol=1e-5)
    assert np.allclose(np.linalg.norm(np.asarray(pt), axis=-1), 3.0)


def test_tv_regularizer_zero_for_constant_table():
    import jax
    import jax.numpy as jnp
    from customnerf_tpu.ops.grid import GridSpec
    from customnerf_tpu.ops.regularizers import grid_total_variation
    spec = GridSpec(num_levels=3, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=16,
                    gridtype="tiled")
    const = jnp.ones((spec.table_size, 2)) * 0.37
    tv0 = grid_total_variation(const, spec, jax.random.PRNGKey(0), 512)
    assert float(tv0) < 1e-10

    import numpy as np
    tab = jnp.asarray(np.random.RandomState(0).randn(spec.table_size, 2)
                      .astype(np.float32))
    tv1 = grid_total_variation(tab, spec, jax.random.PRNGKey(0), 512)
    assert float(tv1) > 1e-4
    g = jax.grad(lambda t: grid_total_variation(t, spec,
                                                jax.random.PRNGKey(0), 512))(tab)
    assert np.any(np.asarray(g) != 0)


def test_srgb_roundtrip():
    import jax.numpy as jnp
    from customnerf_tpu.utils.image import linear_to_srgb, srgb_to_linear
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(srgb_to_linear(linear_to_srgb(x))),
                               np.asarray(x), atol=1e-5)


def test_ply_export(tmp_path):
    from customnerf_tpu.utils.image import export_density_to_ply
    grid = np.zeros((16, 16, 16), np.float32)
    grid[6:10, 6:10, 6:10] = 20.0
    path = export_density_to_ply(grid, origin=[-1, -1, -1],
                                 volume_size=[0.125] * 3,
                                 path=str(tmp_path / "mesh.ply"))
    txt = open(path).read()
    assert txt.startswith("ply")
    assert "element vertex" in txt
