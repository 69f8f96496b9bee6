"""Reference-format checkpoint interop: export → import roundtrip, and the
imported tree drives our field."""

import jax
import jax.numpy as jnp
import numpy as np

from customnerf_tpu.engine.torch_shim import (
    export_reference_checkpoint,
    import_reference_checkpoint,
)
from customnerf_tpu.models.field import FieldConfig, NeRFField
from customnerf_tpu.ops.grid import GridSpec

import pytest

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)

BEAR_GRID = GridSpec(num_levels=16, level_dim=2, base_resolution=16,
                     log2_hashmap_size=21, desired_resolution=8192,
                     gridtype="tiled")


def test_roundtrip_preserves_field_output(tmp_path):
    # use a small grid so the test is fast, but the real MLP dims
    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    # MLP dims must be the reference's (32-in encode → here 8-in): the shim
    # assumes the bear config, so build a field with 16 levels? too slow —
    # instead test pack/unpack directly on the real dims.
    field = NeRFField(FieldConfig(grid=BEAR_GRID))
    params = field.init_params(jax.random.PRNGKey(0))

    path = str(tmp_path / "ref.pth")
    export_reference_checkpoint(params, path, epoch=3, global_step=30)
    loaded = import_reference_checkpoint(path)

    for name in ("feature_net", "density_net", "rgb_net"):
        for layer in params["params"][name]:
            np.testing.assert_allclose(
                np.asarray(loaded["params"][name][layer]["kernel"]),
                np.asarray(params["params"][name][layer]["kernel"]),
                rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["params"]["grid_table"]),
                               np.asarray(params["params"]["grid_table"]),
                               rtol=1e-6)

    # field runs with the imported tree
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    s1, r1 = field.apply(params, x, d)
    s2, r2 = field.apply(loaded, x, d)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)


def test_reference_state_dict_keys(tmp_path):
    field = NeRFField(FieldConfig(grid=BEAR_GRID))
    params = field.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ref2.pth")
    export_reference_checkpoint(params, path)
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt["model"]) == {"pos_en.embeddings", "network.params",
                                  "density_network.params",
                                  "rgb_network.params"}
    # tcnn flat sizes: padded-16 packing
    assert ckpt["model"]["network.params"].numel() == 64 * 32 + 64 * 64 + 64 * 64
    assert ckpt["model"]["density_network.params"].numel() == 64 * 64 + 16 * 64
    assert ckpt["model"]["rgb_network.params"].numel() == 64 * 96 + 16 * 64


def test_load_checkpoint_autodetects_reference_format(tmp_path):
    """engine.checkpoint.load_checkpoint must transparently import
    reference-shaped .pth files (pos_en.embeddings key)."""
    from customnerf_tpu.engine.checkpoint import load_checkpoint

    field = NeRFField(FieldConfig(grid=BEAR_GRID))
    params = field.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ref3.pth")
    export_reference_checkpoint(params, path, epoch=7, global_step=70)

    loaded, meta = load_checkpoint(path)
    assert meta["epoch"] == 7 and meta["global_step"] == 70
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["grid_table"]),
        np.asarray(params["params"]["grid_table"]), rtol=1e-6)


def _variant_field(mask_no_dir=False, detach=False, conf_channels=1,
                   nodetach=False):
    return NeRFField(FieldConfig(
        grid=BEAR_GRID, detach_mask_from_field=detach,
        mask_no_dir=mask_no_dir, mask_no_dir_nodetach=nodetach,
        conf_channels=conf_channels))


def test_variant_head_roundtrip_detach_mask(tmp_path):
    """RGB_network split layout (reference network_grid.py:13-68):
    rgb_network.rgb_network.params + rgb_network.conf_network.params,
    conf net on the full 91-d input (--detach_mask_from_field)."""
    field = _variant_field(detach=True)
    params = field.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ref_split.pth")
    export_reference_checkpoint(params, path)

    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    assert "rgb_network.rgb_network.params" in sd
    assert "rgb_network.conf_network.params" in sd
    assert sd["rgb_network.conf_network.params"].numel() == 64 * 96 + 16 * 64

    loaded = import_reference_checkpoint(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    s1, r1 = field.apply(params, x, d)
    s2, r2 = field.apply(loaded, x, d)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_variant_head_roundtrip_mask_no_dir_keyword2(tmp_path):
    """mask_no_dir (conf net on the 64-d feature only) with keyword2's
    conf_channels=2 — the 64-wide conf input must be inferred from the flat
    size, the channel count from the caller."""
    field = _variant_field(mask_no_dir=True, conf_channels=2)
    params = field.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ref_mnd.pth")
    export_reference_checkpoint(params, path)

    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    assert sd["rgb_network.conf_network.params"].numel() == 64 * 64 + 16 * 64

    loaded = import_reference_checkpoint(path, conf_channels=2)
    assert loaded["params"]["conf_net"]["out"]["kernel"].shape == (64, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    s1, r1 = field.apply(params, x, d)
    s2, r2 = field.apply(loaded, x, d)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)


def test_load_checkpoint_structural_detection_variant(tmp_path):
    """load_checkpoint routes split-layout reference checkpoints through the
    shim even without the pos_en key match being the trigger (detection is
    structural: any tcnn *.params key)."""
    from customnerf_tpu.engine.checkpoint import load_checkpoint

    field = _variant_field(detach=True)
    params = field.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ref_var.pth")
    export_reference_checkpoint(params, path, epoch=2, global_step=20)
    loaded, meta = load_checkpoint(path)
    assert meta["epoch"] == 2
    assert "conf_net" in loaded["params"]
