"""ctypes bindings for the native C++ data engine (csrc/dataio.cpp).

Builds ``libdataio.so`` on first use (g++ -O3, cached next to the source);
every entry point has a NumPy fallback so the framework works without a
toolchain.  Used by the data providers for multi-view ray precompute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libdataio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "dataio.cpp")
    if not os.path.exists(src):
        return False
    base = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _LIB_PATH, src]
    # full build (ray engine + libjpeg/libpng decode), then a codec-less
    # fallback for images without the system image libraries
    for cmd in (base + ["-DHAVE_IMAGE_LIBS", "-ljpeg", "-lpng"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception as e:
            last = e
    print(f"[WARN] native dataio build failed: {last}")
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_CSRC, "dataio.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.generate_rays_pinhole.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, f32p, f32p, ctypes.c_int]
        lib.undistort_fisheye.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int]
        lib.images_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), f32p, ctypes.c_int64,
            ctypes.c_float]
        lib.has_image_codecs.restype = ctypes.c_int
        if lib.has_image_codecs():
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.decode_resize_batch.argtypes = [
                ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int]
            lib.decode_resize_batch.restype = ctypes.c_int
            lib.image_dims.argtypes = [
                u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.image_dims.restype = ctypes.c_int
        _lib = lib
    except OSError as e:
        print(f"[WARN] native dataio load failed: {e}")
    return _lib


def has_image_codecs() -> bool:
    lib = get_lib()
    return bool(lib is not None and lib.has_image_codecs())


def image_dims(path: str):
    """(H, W) from the file header via the native probe; None on failure."""
    lib = get_lib()
    if lib is None or not lib.has_image_codecs():
        return None
    data = np.fromfile(path, np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    rc = lib.image_dims(data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        data.size, ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None


def decode_resize_batch(paths, dh: int, dw: int, gray: bool = False,
                        scale: float = 1.0 / 255.0, n_threads: int = 0,
                        interp: str = "area"):
    """Decode JPEG/PNG files and resize to (dh, dw) in parallel C++
    threads → float32 [n, dh, dw, 3] (or [n, dh, dw] when gray), scaled.
    interp: 'area' (cv2 INTER_AREA box filter — nerfstudio/DTU loaders) or
    'linear' (cv2 INTER_LINEAR bilinear — LLFF's default-resize loader).

    The multithreaded replacement for the per-file cv2.imread/resize loop
    (ROADMAP framework #2 — loader throughput on large scenes).  Returns
    None when codecs are unavailable or any file fails (callers fall back
    to cv2)."""
    lib = get_lib()
    if lib is None or not lib.has_image_codecs():
        return None
    blobs = [np.fromfile(p, np.uint8) for p in paths]
    if any(b.size == 0 for b in blobs):
        return None
    n = len(blobs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * n)(*(b.ctypes.data_as(u8p) for b in blobs))
    sizes = (ctypes.c_int64 * n)(*(b.size for b in blobs))
    c = 1 if gray else 3
    out = np.empty((n, dh, dw, c), np.float32)
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 1, 1), 8)
    fails = lib.decode_resize_batch(
        ptrs, sizes, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh, dw, int(gray), ctypes.c_float(scale),
        1 if interp == "linear" else 0, n_threads)
    if fails:
        print(f"[WARN] native decode failed on {fails}/{n} images; "
              "falling back to cv2")
        return None
    return out[..., 0] if gray else out


def generate_rays_pinhole(c2w: np.ndarray, H: int, W: int, fx, fy, cx, cy,
                          lvl: float = 1.0, n_threads: int = 0):
    """c2w [n,3,4] → (origins [n,H,W,3], dirs [n,H,W,3]).  Native when the
    library builds, NumPy otherwise — identical math either way."""
    c2w = np.ascontiguousarray(c2w, np.float32)
    n = c2w.shape[0]
    lib = get_lib()
    if lib is not None:
        origins = np.empty((n, H, W, 3), np.float32)
        dirs = np.empty((n, H, W, 3), np.float32)
        if n_threads <= 0:
            n_threads = min(max(os.cpu_count() or 1, 1), 8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.generate_rays_pinhole(
            c2w.ctypes.data_as(f32p), n, H, W,
            ctypes.c_float(fx), ctypes.c_float(fy),
            ctypes.c_float(cx), ctypes.c_float(cy), ctypes.c_float(lvl),
            origins.ctypes.data_as(f32p), dirs.ctypes.data_as(f32p),
            n_threads)
        return origins, dirs
    return _numpy_rays(c2w, H, W, fx, fy, cx, cy, lvl)


def _numpy_rays(c2w, H, W, fx, fy, cx, cy, lvl):
    ty = np.linspace(0, H * lvl - 1, H, dtype=np.float32) + 0.5
    tx = np.linspace(0, W * lvl - 1, W, dtype=np.float32) + 0.5
    px, py = np.meshgrid(tx, ty)  # [H, W]
    u = (px - cx) / fx
    v = -(py - cy) / fy
    d_cam = np.stack([u, v, -np.ones_like(u)], -1)  # [H, W, 3]
    origins, dirs = [], []
    for i in range(c2w.shape[0]):
        rot = c2w[i, :3, :3]
        d = d_cam @ rot.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[i, :3, 3], d.shape)
        origins.append(o.astype(np.float32))
        dirs.append(d.astype(np.float32))
    return np.stack(origins), np.stack(dirs)


def undistort_fisheye(coords: np.ndarray, params: np.ndarray,
                      iters: int = 10) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from customnerf_tpu.data.camera import radial_and_tangential_undistort
        return radial_and_tangential_undistort(
            coords, np.tile(params[None], (coords.shape[0], 1)),
            max_iterations=iters)
    out = np.ascontiguousarray(coords, np.float32).copy()
    p = np.ascontiguousarray(params, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.undistort_fisheye(out.ctypes.data_as(f32p), p.ctypes.data_as(f32p),
                          out.shape[0], iters)
    return out
