"""customnerf_tpu — TPU-native CustomNeRF framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
hrz2000/CustomNeRF (arXiv 2312.01663): Instant-NGP-style NeRF reconstruction
with a learned foreground-mask channel, and text/image-driven 3D scene editing
via Stable Diffusion SDS guidance with Local-Global Iterative Editing (LGIE).

Layer map (bottom → top), mirroring the reference's layers (SURVEY.md §1) but
designed TPU-first:

  ops/       — XLA + Pallas compute kernels (hash/tiled grid encoding,
               volume compositing, ray/AABB math, occupancy grid,
               PDF importance sampling).  Replaces the reference CUDA
               extensions (gridencoder/, raymarching/) with dense,
               static-shape, MXU/VPU-friendly formulations.
  models/    — the NeRF field (grid encoder + bias-free MLPs + mask channel)
               and the functional volume renderer.
  data/      — nerfstudio / LLFF / DTU providers producing device-resident
               fixed-shape ray batches.
  guidance/  — Flax Stable Diffusion (UNet/VAE/CLIP text) + SDS loss,
               CLIP view matching, Custom Diffusion concept tuning.
  engine/    — trainer (reconstruction + LGIE editing), checkpointing,
               evaluation/test rendering, logging.
  parallel/  — jax.sharding Mesh helpers; rays/scenes as data-parallel axes.
"""

__version__ = "0.1.0"

from customnerf_tpu.config import Config  # noqa: F401
