"""Compute kernels: XLA (oracle) and Pallas (fast-path) implementations.

Replaces the reference's CUDA extensions:
  * ``gridencoder/``  → :mod:`customnerf_tpu.ops.grid` (+ ``grid_pallas``)
  * ``raymarching/``  → :mod:`customnerf_tpu.ops.ray`,
    :mod:`customnerf_tpu.ops.composite`, :mod:`customnerf_tpu.ops.occupancy`
"""

from customnerf_tpu.ops.activations import trunc_exp
from customnerf_tpu.ops.frequency import freq_encode, freq_encode_dim
from customnerf_tpu.ops.grid import GridSpec, grid_encode, grid_init
from customnerf_tpu.ops.ray import near_far_from_aabb
from customnerf_tpu.ops.composite import alphas_from_sigmas, weights_from_alphas, sample_pdf

__all__ = [
    "trunc_exp",
    "freq_encode",
    "freq_encode_dim",
    "GridSpec",
    "grid_encode",
    "grid_init",
    "near_far_from_aabb",
    "alphas_from_sigmas",
    "weights_from_alphas",
    "sample_pdf",
]
