"""The grid-NeRF field: tiled-grid encoder + MLP heads + mask channel.

Functional equivalent of the reference ``nerf/network_grid.py`` designed for
the MXU: the three tcnn ``FullyFusedMLP``s (feature 32→64×2, density 64→1,
rgb 27+64→3+conf sigmoid; all 64 neurons, bias-free) become plain Flax Dense
stacks that XLA fuses — at 64-wide, batched over N_rays·T samples, these are
pure MXU matmuls and need no hand-written kernel (SURVEY.md §2.1 N5 mapping).

Semantics preserved:
  * tiledgrid encoder, log2_hashmap_size=21, desired_resolution=8192
    (network_grid.py:89-96) → 16 levels × 2 dims = 32-d position feature.
  * frequency dir embedding, multires 4 → 27-d (network_grid.py:114).
  * density = trunc_exp(density_net(feat) + gaussian blob), blob
    ``5·exp(−‖x‖²/(2·0.2²))`` on *world* coords (network_grid.py:150-156,166).
  * rgb head emits 3+ndim sigmoid channels; channel 4 is the foreground
    confidence/mask (network_grid.py:121-129).
  * split-head variants: ``detach_mask_from_field`` (conf net on detached
    rgb-net input) and ``mask_no_dir`` (conf net on the 64-d feature only,
    detached unless ``mask_no_dir_nodetach``) — network_grid.py:13-68.
  * ``keyword2`` (2-channel conf) supported explicitly instead of the
    reference's latent AttributeError (network_grid.py:45, SURVEY.md §5.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from customnerf_tpu.ops.activations import trunc_exp
from customnerf_tpu.ops.frequency import freq_encode, freq_encode_dim
from customnerf_tpu.ops.grid import GridSpec, grid_encode, grid_init
from customnerf_tpu.ops.triplane import (TriplaneSpec, triplane_encode,
                                         triplane_init)


def encode_positions(x01, table, spec):
    """Dispatch to the position encoder selected by the spec type: hash/tiled
    grid (GridSpec, --grid_type hash|tiled) or tri-plane (TriplaneSpec,
    --grid_type triplane — the TPU-tuned low-row-count field)."""
    if isinstance(spec, TriplaneSpec):
        return triplane_encode(x01, table, spec)
    return grid_encode(x01, table, spec)


def encoder_init(key, spec, dtype=jnp.float32):
    if isinstance(spec, TriplaneSpec):
        return triplane_init(key, spec, dtype=dtype)
    return grid_init(key, spec, dtype=dtype)


@dataclass(frozen=True)
class FieldConfig:
    bound: float = 2.0
    grid: GridSpec = dc_field(
        default_factory=lambda: GridSpec(
            input_dim=3,
            num_levels=16,
            level_dim=2,
            base_resolution=16,
            log2_hashmap_size=21,
            desired_resolution=8192,
            gridtype="tiled",
        )
    )
    dir_multires: int = 4
    hidden: int = 64
    train_conf: bool = True
    conf_channels: int = 1            # 2 when keyword2 is set
    detach_mask_from_field: bool = False
    mask_no_dir: bool = False
    mask_no_dir_nodetach: bool = False
    use_bias: bool = False            # tcnn MLPs are bias-free
    compute_dtype: str = "float32"    # "bfloat16" under the fp16 flag

    @property
    def dir_dim(self) -> int:
        return freq_encode_dim(self.dir_multires)


class MLP(nn.Module):
    """Bias-free ReLU MLP matching tcnn.Network(n_neurons, n_hidden_layers)."""

    out_dim: int
    hidden: int
    n_hidden: int
    output_activation: Optional[str] = None  # None | "sigmoid"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.n_hidden):
            x = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                         name=f"hidden_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="out")(x)
        if self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x.astype(jnp.float32)


class NeRFField(nn.Module):
    """Grid-NeRF field with a learned foreground-confidence channel."""

    cfg: FieldConfig

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        self.table = self.param(
            "grid_table", lambda key: encoder_init(key, c.grid, dtype=jnp.float32)
        )
        self.feature_net = MLP(out_dim=c.hidden, hidden=c.hidden, n_hidden=2,
                               use_bias=c.use_bias, dtype=dt, name="feature_net")
        self.density_net = MLP(out_dim=1, hidden=c.hidden, n_hidden=1,
                               use_bias=c.use_bias, dtype=dt, name="density_net")
        rgb_in_conf = not (c.detach_mask_from_field or c.mask_no_dir)
        if c.train_conf and rgb_in_conf:
            # single fused head: 3 rgb + conf channels
            self.rgb_net = MLP(out_dim=3 + c.conf_channels, hidden=c.hidden,
                               n_hidden=1, output_activation="sigmoid",
                               use_bias=c.use_bias, dtype=dt, name="rgb_net")
            self.conf_net = None
        else:
            self.rgb_net = MLP(out_dim=3, hidden=c.hidden, n_hidden=1,
                               output_activation="sigmoid",
                               use_bias=c.use_bias, dtype=dt, name="rgb_net")
            if c.train_conf:
                # conf-net input dim is implied by its call site
                self.conf_net = MLP(out_dim=c.conf_channels, hidden=c.hidden,
                                    n_hidden=1, output_activation="sigmoid",
                                    use_bias=c.use_bias, dtype=dt, name="conf_net")
            else:
                self.conf_net = None

    def gaussian_blob(self, x):
        """Density blob at the scene centre (network_grid.py:150-156)."""
        d = jnp.sum(x * x, axis=-1)
        return 5.0 * jnp.exp(-d / (2.0 * 0.2 ** 2))

    def _features(self, x):
        x01 = (x + self.cfg.bound) / (2.0 * self.cfg.bound)
        x_en = encode_positions(x01, self.table, self.cfg.grid)
        return self.feature_net(x_en)

    def density(self, x):
        """x: [..., 3] world coords in [-bound, bound] → sigma [...]."""
        fea = self._features(x)
        raw = self.density_net(fea)[..., 0]
        return trunc_exp(raw + self.gaussian_blob(x))

    def __call__(self, x, d):
        """Fused field eval.

        Args:
          x: [..., 3] positions, d: [..., 3] view directions.
        Returns:
          sigma [...], radiance [..., 3 + conf_channels] (conf channels only
          when train_conf).
        """
        c = self.cfg
        fea = self._features(x)
        raw = self.density_net(fea)[..., 0]
        sigma = trunc_exp(raw + self.gaussian_blob(x))

        view_en = freq_encode(d, c.dir_multires)
        rgb_input = jnp.concatenate([view_en, fea], axis=-1)

        if self.conf_net is None:
            radiance = self.rgb_net(rgb_input)  # 3 or 3+conf fused
        else:
            rgb = self.rgb_net(rgb_input)
            if c.mask_no_dir:
                conf_in = fea if c.mask_no_dir_nodetach else jax.lax.stop_gradient(fea)
            else:
                conf_in = jax.lax.stop_gradient(rgb_input)
            conf = self.conf_net(conf_in)
            radiance = jnp.concatenate([rgb, conf], axis=-1)
        return sigma, radiance

    def init_params(self, key, dtype=jnp.float32):
        x = jnp.zeros((2, 3), dtype)
        d = jnp.zeros((2, 3), dtype)
        return self.init(key, x, d)


def make_pallas_apply(field: NeRFField, params):
    """Build (fused_fn, density_fn) that reproduce the standard fused-head
    field using the Pallas fully-fused MLP kernel (ops/fused_mlp_pallas).

    Only valid for the default configuration (single fused rgb+conf head,
    bias-free) — the variant heads fall back to the flax path.
    Returns None when the config isn't kernel-compatible.
    """
    c = field.cfg
    if c.use_bias or c.detach_mask_from_field or c.mask_no_dir:
        return None
    p = params["params"]
    if "conf_net" in p:
        return None
    from customnerf_tpu.ops.fused_mlp_pallas import fused_field_mlp

    weights = [
        p["feature_net"]["hidden_0"]["kernel"],
        p["feature_net"]["hidden_1"]["kernel"],
        p["feature_net"]["out"]["kernel"],
        p["density_net"]["hidden_0"]["kernel"],
        p["density_net"]["out"]["kernel"],
        p["rgb_net"]["hidden_0"]["kernel"],
        p["rgb_net"]["out"]["kernel"],
    ]
    table = p["grid_table"]

    def fused(x, d):
        prefix = x.shape[:-1]
        xf = x.reshape(-1, 3)
        df = d.reshape(-1, 3)
        x01 = (xf + c.bound) / (2.0 * c.bound)
        x_en = encode_positions(x01, table, c.grid)
        view_en = freq_encode(df, c.dir_multires)
        sigma_raw, rgb_raw = fused_field_mlp(x_en, view_en, weights)
        blob = 5.0 * jnp.exp(-jnp.sum(xf * xf, -1) / (2.0 * 0.2 ** 2))
        sigma = trunc_exp(sigma_raw + blob)
        radiance = jax.nn.sigmoid(rgb_raw)
        return (sigma.reshape(prefix),
                radiance.reshape(*prefix, radiance.shape[-1]))

    def density(x):
        # reuse the fused kernel with zero dirs (rgb head wasted but cheap)
        sigma, _ = fused(x, jnp.zeros_like(x))
        return sigma

    return fused, density


def param_label_fn(params):
    """Label pytree leaves 'grid' vs 'mlp' for per-group LR (the reference
    trains the encoder at lr×10, network_grid.py:196-206)."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: "grid" if any(
            getattr(p, "key", getattr(p, "name", None)) == "grid_table" for p in path
        ) else "mlp",
        params,
    )
    return flat
