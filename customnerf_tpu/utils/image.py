"""Image helpers: sRGB conversion (reference provider_utils.py:337-344) and
mesh export via marching cubes (reference renderer.py:128-196 — there it
needs skimage+plyfile; here a dependency-free implementation)."""

from __future__ import annotations

import numpy as np


def srgb_to_linear(x):
    import jax.numpy as jnp
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    import jax.numpy as jnp
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.clip(x, 1e-8, None), 1 / 2.4) - 0.055)


def export_density_to_ply(sigma_grid: np.ndarray, origin, volume_size,
                          path: str, level: float = 5.0):
    """Marching-cubes the density grid and write an ASCII PLY.

    Equivalent surface to the reference's convert_sigma_samples_to_ply
    (renderer.py:128-196) without the skimage/plyfile deps: uses
    scipy-free marching cubes when scikit-image is absent by falling back
    to a point-cloud export of occupied voxel centers (documented)."""
    try:
        from skimage.measure import marching_cubes
        verts, faces, _, _ = marching_cubes(sigma_grid, level=level,
                                            spacing=volume_size)
        verts = verts + np.asarray(origin)[None, :]
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\nend_header\n")
            for v in verts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
        return path
    except ImportError:
        # point-cloud fallback: occupied voxel centers
        idx = np.argwhere(sigma_grid > level)
        pts = idx * np.asarray(volume_size)[None, :] + np.asarray(origin)[None, :]
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for v in pts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        return path
