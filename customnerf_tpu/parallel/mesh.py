"""Device-mesh helpers: rays (and scenes) as first-class data-parallel axes.

The reference's distributed story is dead DDP scaffolding
(``nerf/utils_init_nerf.py:76-78, 709-726``; SURVEY.md §2.3).  Here data
parallelism over the ray dimension is native: batches are sharded along a
``data`` mesh axis with ``NamedSharding``, params are replicated, and XLA
inserts the gradient ``psum`` over ICI on its own — no explicit comm backend
objects (SURVEY.md §5.8 "TPU-native equivalent").

The reference's serial ray *chunking* (``--max_ray_batch``, staged renderers
renderer.py:1749-1765) maps to sharding the same axis across devices
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` when configured.

    The reference's distributed story is dead DDP scaffolding; ours is the
    JAX-native one — after this call ``jax.devices()`` is the GLOBAL device
    list and the same ``make_mesh`` spec spans hosts, with XLA routing
    collectives over ICI within a slice and DCN across slices.  Configure
    via args or the standard env (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — also set automatically on
    Cloud TPU).  Returns True when initialization ran; False = single-host
    no-op (the common case in this repo's test environment).
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)
    return True


def make_mesh(spec: str = "", devices=None) -> Optional[Mesh]:
    """Build a mesh from a 'axis:count,axis:count' spec string.

    '' → None (single device).  'data:8' → 1-D mesh of 8 devices.
    'scene:2,data:4' → 2-D mesh (batched multi-edit stretch, BASELINE
    config 5).  Axis order matters on hardware: the LAST axis gets the
    fastest-varying (ICI-adjacent) devices, so put the heavy-communication
    axis (``data`` — per-step grad psum) last and the light one (``scene``)
    first, where a multi-slice deployment would cross DCN.

    Device order comes from ``mesh_utils.create_device_mesh`` (ICI-topology
    aware) when the full device set is used; explicit ``devices`` subsets
    fall back to simple reshaping.
    """
    if not spec:
        return None
    explicit = devices is not None
    devices = devices if devices is not None else jax.devices()
    axes = []
    for part in spec.split(","):
        name, count = part.split(":")
        axes.append((name.strip(), int(count)))
    shape = [c for _, c in axes]
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(f"mesh spec {spec} needs {total} devices, have {len(devices)}")
    if not explicit and total == len(devices):
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(dev_array, axis_names=[n for n, _ in axes])
        except Exception:
            pass  # odd topologies: fall through to plain reshape
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, axis_names=[n for n, _ in axes])


def pad_to_multiple(x, multiple: int, axis: int = 0, mode: str = "constant"):
    """Pad axis 0 so shardings divide evenly; returns (padded, orig_len).

    mode="edge" replicates the last row instead of zero-filling — required
    when padding RAYS: a zero-direction ray makes ``near_far_from_aabb``
    return far=inf, and 0·inf NaNs poison every parameter gradient through
    the batched matmul VJPs even though the padded outputs are sliced off
    before the loss (the cotangent is zero but the primal is NaN)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    import jax.numpy as jnp

    return jnp.pad(x, pad_width, mode=mode), n


def shard_batch(mesh: Optional[Mesh], batch, axis_name: str = "data"):
    """Place [N, ...] arrays sharded along the ray axis of the mesh."""
    if mesh is None:
        return batch
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Optional[Mesh], tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
