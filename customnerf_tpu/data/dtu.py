"""DTU provider (cameras_sphere.npz / cameras_large.npz).

Re-derivation of reference ``nerf/provider.py:496-640``: projection matrices
``P = world_mat @ scale_mat`` decomposed into K, R, t; rays from the inverse
intrinsics through pixel centers, rotated by the pose.
"""

from __future__ import annotations

import glob
import os

import cv2
import numpy as np

from customnerf_tpu.data.base import Provider


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3×4 projection matrix into intrinsics + c2w pose
    (reference provider.py:472-493, via cv2.decomposeProjectionMatrix)."""
    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics.astype(np.float32), pose


class DTUProvider(Provider):
    def __init__(self, data_dir: str, split: str = "train", resolution_level=1,
                 opt=None, R_path=None):
        super().__init__(split, train_size=getattr(opt, "train_size", 100),
                         seed=getattr(opt, "seed", 0))
        self.data_dir = data_dir
        self.resolution_level = float(resolution_level)
        self.opt = opt
        self.R_path = R_path
        self._load()
        self._generate_rays()
        self.finalize(device_resident=bool(getattr(opt, "if_data_cuda", 1)))

    def _load(self):
        if getattr(self.opt, "if_sphere", False):
            cams = np.load(os.path.join(self.data_dir, "cameras_sphere.npz"))
        else:
            cams = np.load(os.path.join(self.data_dir, "cameras_large.npz"))

        self.images_lis = sorted(glob.glob(os.path.join(self.data_dir, "image/*.png")))
        self.masks_lis = sorted(glob.glob(os.path.join(self.data_dir, "mask/*.png")))
        self.n_images = len(self.images_lis)

        intrinsics_all, pose_all = [], []
        for idx in range(self.n_images):
            world_mat = cams[f"world_mat_{idx}"].astype(np.float32)
            scale_mat = cams[f"scale_mat_{idx}"].astype(np.float32)
            P = (world_mat @ scale_mat)[:3, :4]
            K, pose = load_K_Rt_from_P(P)
            intrinsics_all.append(K)
            pose_all.append(pose)
        self.intrinsics_all = np.stack(intrinsics_all)
        self.intrinsics_all_inv = np.linalg.inv(self.intrinsics_all)
        self.pose_all = np.stack(pose_all)
        if self.R_path:
            R = np.load(self.R_path).astype(np.float32)
            self.pose_all = R @ self.pose_all

        images, masks, H, W = [], [], [], []
        native_imgs = None
        if os.environ.get("CUSTOMNERF_NATIVE_DECODE", "1") != "0":
            # C++ batch decoder (csrc/dataio.cpp) — same INTER_AREA
            # semantics, parallel across views; cv2 loop is the fallback
            from customnerf_tpu.utils import native
            if native.has_image_codecs():
                dims = [native.image_dims(p) for p in self.images_lis]
                if dims and all(d is not None for d in dims) \
                        and len(set(dims)) == 1:
                    dh = int(dims[0][0] / self.resolution_level)
                    dw = int(dims[0][1] / self.resolution_level)
                    native_imgs = native.decode_resize_batch(
                        self.images_lis, dh, dw, scale=1.0 / 256.0)
        if native_imgs is not None:
            images = list(native_imgs)
            H = [native_imgs.shape[1]] * len(images)
            W = [native_imgs.shape[2]] * len(images)
            native_masks = native.decode_resize_batch(
                self.masks_lis, H[0], W[0], gray=True,
                scale=1.0 / 256.0) if self.masks_lis else None
            if native_masks is not None:
                for m in native_masks:
                    m = m.copy()
                    m[m > 0] = 1.0
                    masks.append(m)
        if not images:
            for p in self.images_lis:
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 256.0
                img = cv2.resize(
                    img,
                    (int(img.shape[1] / self.resolution_level),
                     int(img.shape[0] / self.resolution_level)),
                    interpolation=cv2.INTER_AREA)
                H.append(img.shape[0]); W.append(img.shape[1]); images.append(img)
        if not masks:
            for p in self.masks_lis:
                m = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 256.0
                m = cv2.resize(m, (W[0], H[0]), interpolation=cv2.INTER_AREA)
                m[m > 0] = 1.0
                masks.append(m)
        if not masks:
            masks = [np.zeros((H[0], W[0]), np.float32) for _ in images]
        self.images, self.masks, self.H, self.W = images, masks, H, W

    def _generate_rays(self):
        origins, directions = [], []
        lvl = self.resolution_level
        for i in range(self.n_images):
            H, W = self.H[i], self.W[i]
            tx = np.linspace(0, W * lvl - 1, W, dtype=np.float32)
            ty = np.linspace(0, H * lvl - 1, H, dtype=np.float32)
            px, py = np.meshgrid(tx, ty, indexing="ij")  # [W, H]
            p = np.stack([px, py, np.ones_like(py)], -1)  # [W, H, 3]
            p = (self.intrinsics_all_inv[i, :3, :3] @ p[..., None])[..., 0]
            rays_v = p / np.linalg.norm(p, axis=-1, keepdims=True)
            rays_v = (self.pose_all[i, :3, :3] @ rays_v[..., None])[..., 0]
            rays_v = rays_v / np.linalg.norm(rays_v, axis=-1, keepdims=True)
            rays_o = np.broadcast_to(self.pose_all[i, :3, 3], rays_v.shape)
            origins.append(rays_o.transpose(1, 0, 2).astype(np.float32).copy())
            directions.append(rays_v.transpose(1, 0, 2).astype(np.float32))
        self.origins, self.directions = origins, directions
