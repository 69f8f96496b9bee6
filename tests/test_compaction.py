"""Cross-ray active-sample compaction (ops/compaction.py + the
render_rays_fast compact_frac path).

Key guarantee: when no block overflows its budget the compacted render is
EXACT (one-hot matmul 0/1 products; every valid sample evaluated at the
same coordinates) — forward outputs and parameter gradients must match the
uncompacted fast path.  Overflow degrades to the march's even-stride
subsample with a per-block quadrature dt scale.
"""

import numpy as np
import jax
import jax.numpy as jnp

from customnerf_tpu.models.field import FieldConfig, NeRFField
from customnerf_tpu.models.renderer import RenderSettings, render_rays_fast
from customnerf_tpu.ops.compaction import (block_budget, compact_blocks,
                                           ray_permutation, uncompact_blocks)
from customnerf_tpu.ops.grid import GridSpec
from customnerf_tpu.ops.occupancy import init_state, state_from_grid

import pytest


def _setup(n_rays=40, occupied_frac=0.3, seed=0):
    rng = np.random.RandomState(seed)
    grid_size = 32
    occ0 = init_state(cascade=1, grid_size=grid_size)
    dens = (rng.rand(*occ0.density_grid.shape) < occupied_frac) * 100.0
    occ = state_from_grid(dens.astype(np.float32), 1.0, density_thresh=10.0,
                          grid_size=grid_size)
    o = np.tile(np.asarray([[0.0, 0.0, -1.2]], np.float32), (n_rays, 1))
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.25 + np.asarray(
        [0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    field = NeRFField(FieldConfig(bound=1.0, grid=grid))
    params = field.init_params(jax.random.PRNGKey(seed))
    s = RenderSettings(bound=1.0, num_steps=16, upsample_steps=0,
                      soft_mask=True)
    return field, params, jnp.asarray(o), jnp.asarray(d), occ, s


def test_compact_blocks_exact_and_overflow():
    rng = np.random.RandomState(1)
    N, K, G = 8, 6, 4
    valid = rng.rand(N, K) < 0.4
    vals = rng.randn(N, K, 3).astype(np.float32)
    budget = G * K  # cannot overflow
    vals_c, onehot, slot_valid, scale = compact_blocks(
        jnp.asarray(valid), jnp.asarray(vals), G, budget)
    # every valid sample kept, scale 1
    np.testing.assert_allclose(np.asarray(scale), 1.0)
    back = np.asarray(uncompact_blocks(onehot, vals_c)).reshape(N, K, 3)
    np.testing.assert_allclose(back[valid], vals[valid], rtol=0, atol=0)
    np.testing.assert_allclose(back[~valid], 0.0)
    # slot occupancy matches per-block valid counts
    counts = valid.reshape(N // G, G * K).sum(-1)
    np.testing.assert_array_equal(np.asarray(slot_valid).sum(-1), counts)

    # overflow: half the budget → even-stride keeps exactly `budget` and
    # the quadrature scale is n_valid/budget
    all_valid = jnp.ones((N, K), bool)
    budget2 = (G * K) // 2
    vals_c2, onehot2, slot_valid2, scale2 = compact_blocks(
        all_valid, jnp.asarray(vals), G, budget2)
    assert int(np.asarray(slot_valid2).sum()) == budget2 * (N // G)
    np.testing.assert_allclose(np.asarray(scale2), G * K / budget2)
    # kept samples land unchanged (subset of originals)
    back2 = np.asarray(uncompact_blocks(onehot2, vals_c2)).reshape(N, K, 3)
    kept = np.abs(back2).sum(-1) > 0
    np.testing.assert_allclose(back2[kept], vals[kept])
    assert kept.sum() == budget2 * (N // G)


def test_ray_permutation_bijective():
    for n in (40, 128, 2394):
        perm, inv = ray_permutation(n)
        assert sorted(perm.tolist()) == list(range(n))
        np.testing.assert_array_equal(perm[inv], np.arange(n))


def test_block_budget_rounding():
    assert block_budget(16, 40, 0.5) == 384   # 320 → rounded up to 384
    assert block_budget(16, 40, 1.0) == 640   # capped at G·K
    assert block_budget(4, 8, 0.1) == 32      # min(128, G·K) cap


@pytest.mark.slow
def test_compacted_render_matches_plain_when_no_overflow():
    field, params, o, d, occ, s = _setup()

    key = jax.random.PRNGKey(0)
    kw = dict(n_coarse=32, n_keep=16, train=True, perturb=True)
    ref = render_rays_fast(field, params, o, d, occ, key, s, **kw)
    # frac=1.0 → budget = G·K → no block can overflow → exact
    got = render_rays_fast(field, params, o, d, occ, key, s,
                           compact_frac=1.0, compact_block=8, **kw)
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


@pytest.mark.slow
def test_compacted_render_grads_match():
    field, params, o, d, occ, s = _setup(n_rays=24)
    key = jax.random.PRNGKey(3)
    target = jax.random.uniform(jax.random.PRNGKey(9), (24, 3))

    def loss(p, frac):
        out = render_rays_fast(field, p, o, d, occ, key, s,
                               n_coarse=32, n_keep=16, train=True,
                               perturb=True, compact_frac=frac,
                               compact_block=8)
        return jnp.mean((out["image"] - target) ** 2)

    g_ref = jax.grad(lambda p: loss(p, 0.0))(params)
    g_cmp = jax.grad(lambda p: loss(p, 1.0))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_cmp = jax.tree_util.tree_leaves(g_cmp)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat_ref)
    for a, b in zip(flat_ref, flat_cmp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_compacted_render_overflow_is_finite_and_close():
    """A tiny budget forces every block to overflow: outputs stay finite,
    weights bounded, and the even-stride + dt-scale quadrature keeps the
    image in the neighbourhood of the full render on a smooth field."""
    field, params, o, d, occ, s = _setup(n_rays=32, occupied_frac=0.9)
    key = jax.random.PRNGKey(5)
    kw = dict(n_coarse=32, n_keep=16, train=True, perturb=False)
    ref = render_rays_fast(field, params, o, d, occ, key, s, **kw)
    got = render_rays_fast(field, params, o, d, occ, key, s,
                           compact_frac=0.25, compact_block=8, **kw)
    img = np.asarray(got["image"])
    assert np.isfinite(img).all()
    assert (np.asarray(got["weights_sum"]) <= 1.0 + 1e-5).all()
    # quadrature sanity: opacity mass within 15% of the full render's
    ws_ref = np.asarray(ref["weights_sum"]).mean()
    ws_got = np.asarray(got["weights_sum"]).mean()
    assert abs(ws_got - ws_ref) < 0.15 * max(ws_ref, 1e-3)


def test_cli_accepts_compact_flags():
    from customnerf_tpu.config import parse_args

    opt = parse_args(["--compact_frac", "0.5", "--compact_block", "8",
                      "--workspace", "/tmp/x"])
    assert opt.compact_frac == 0.5 and opt.compact_block == 8
    assert opt.compact_layout == "planes"
    opt2 = parse_args(["--compact_layout", "wide", "--workspace", "/tmp/x"])
    assert opt2.compact_layout == "wide"
    try:
        parse_args(["--compact_frac", "1.5", "--workspace", "/tmp/x"])
        raised = False
    except ValueError:
        raised = True
    assert raised
    try:
        parse_args(["--compact_layout", "diagonal", "--workspace", "/tmp/x"])
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_compact_remat_is_exact():
    """compact_remat=True (editing graphs recompute the one-hot compaction
    matrices in the backward instead of saving multi-GB residuals) is
    numerically identical — outputs AND parameter gradients."""
    field, params, o, d, occ, s = _setup(n_rays=24)
    key = jax.random.PRNGKey(7)
    target = jax.random.uniform(jax.random.PRNGKey(11), (24, 3))
    kw = dict(n_coarse=32, n_keep=16, train=True, perturb=True,
              compact_frac=0.5, compact_block=8)

    def loss(p, remat):
        out = render_rays_fast(field, p, o, d, occ, key, s,
                               compact_remat=remat, **kw)
        return jnp.mean((out["image"] - target) ** 2), out["image"]

    (l0, img0), g0 = jax.value_and_grad(loss, has_aux=True)(params, False)
    (l1, img1), g1 = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               rtol=0, atol=0)
    np.testing.assert_allclose(float(l1), float(l0), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_compact_layout_planes_equals_wide():
    """The round-5 channel-major plane layout (no tiny-minor-dim
    materializations — docs/PERF.md) is numerically equivalent to the
    round-3 wide layout: outputs and parameter gradients, in both the
    exact (no-overflow) and overflow regimes, including the detach_bg
    plane branch of _composite."""
    field, params, o, d, occ, _ = _setup(n_rays=42)
    s = RenderSettings(bound=1.0, num_steps=16, upsample_steps=0,
                       soft_mask=True, detach_bg=True)
    key = jax.random.PRNGKey(2)
    target = jax.random.uniform(jax.random.PRNGKey(4), (42, 3))

    for frac in (0.5, 0.15):  # 0.15 forces block overflow (even-stride)
        kw = dict(n_coarse=32, n_keep=16, train=True, perturb=True,
                  compact_frac=frac, compact_block=8)

        def loss(p, layout):
            out = render_rays_fast(field, p, o, d, occ, key, s,
                                   compact_layout=layout, **kw)
            l = (jnp.mean((out["image"] - target) ** 2)
                 + jnp.mean(out["render_mask"] ** 2)
                 + jnp.mean(out["bg"]["image"] ** 2))
            return l, out

        (lw, ow), gw = jax.value_and_grad(loss, has_aux=True)(params, "wide")
        (lp, op_), gp = jax.value_and_grad(loss, has_aux=True)(params,
                                                               "planes")
        for k in ("image", "depth", "weights_sum", "render_mask"):
            np.testing.assert_allclose(np.asarray(op_[k]), np.asarray(ow[k]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"{k} frac={frac}")
        for side in ("fg", "bg"):
            np.testing.assert_allclose(np.asarray(op_[side]["image"]),
                                       np.asarray(ow[side]["image"]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"{side} frac={frac}")
        np.testing.assert_allclose(float(lp), float(lw), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gw),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-5, atol=1e-6)


@pytest.mark.slow
def test_compacted_render_ray_count_not_divisible_by_block():
    """N % compact_block != 0 exercises the edge-replicate ray padding
    inside _eval_field_compacted (zero-padding would NaN the grads — the
    editing-mesh padding lesson)."""
    field, params, o, d, occ, s = _setup(n_rays=42)
    key = jax.random.PRNGKey(1)
    kw = dict(n_coarse=32, n_keep=16, train=True, perturb=True)
    ref = render_rays_fast(field, params, o, d, occ, key, s, **kw)
    got = render_rays_fast(field, params, o, d, occ, key, s,
                           compact_frac=1.0, compact_block=8, **kw)
    np.testing.assert_allclose(np.asarray(got["image"]),
                               np.asarray(ref["image"]),
                               rtol=2e-5, atol=2e-6)

    def loss(p):
        out = render_rays_fast(field, p, o, d, occ, key, s,
                               compact_frac=0.5, compact_block=8, **kw)
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
