"""Mesh-sharded eval rendering matches single-device rendering."""

import numpy as np

from customnerf_tpu.config import Config
from customnerf_tpu.data.base import NeRFDataset
from customnerf_tpu.engine.trainer import Trainer


def _cfg(ws, **kw):
    return Config(data_type="synthetic", workspace=ws, iters=50, lr=1e-2,
                  num_steps=8, upsample_steps=0, train_size=3, soft_mask=True,
                  grid_levels=4, log2_hashmap_size=10, desired_resolution=32,
                  grid_base_resolution=4, use_ckpt="scratch",
                  max_ray_batch=2048, **kw)


def test_sharded_render_matches_single(tmp_path):
    opt_a = _cfg(str(tmp_path / "a"))
    opt_b = _cfg(str(tmp_path / "b"), mesh_shape="data:8")

    tr_a = Trainer("df", opt_a, use_checkpoint="scratch")
    tr_b = Trainer("df", opt_b, use_checkpoint="scratch")
    # same params in both
    tr_b.params = tr_a.params if tr_b.mesh is None else tr_b.params
    import jax
    from customnerf_tpu.parallel.mesh import replicate
    tr_b.params = replicate(tr_b.mesh, tr_a.params)

    loader = NeRFDataset(opt_a, type="val").dataloader()
    b = loader.item(0)
    img_a = np.asarray(tr_a.render_image(b.rays_o, b.rays_d)["image"])
    img_b = np.asarray(tr_b.render_image(b.rays_o, b.rays_d)["image"])
    np.testing.assert_allclose(img_a, img_b, rtol=1e-4, atol=1e-5)
