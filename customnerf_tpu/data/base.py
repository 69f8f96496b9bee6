"""Dataset facade + fixed-shape device-resident ray batches.

TPU-first replacement for the reference providers (``nerf/provider.py``):
instead of a torch DataLoader yielding CPU tensors, every split precomputes
all rays once (the reference already does this with ``--if_data_cuda``,
provider.py:116-132) into stacked NumPy arrays, uploads them to device
memory, and serves static-shape batches — no host↔device traffic in the
training loop beyond an integer index.

Item contract matches the reference tuple
``(rgbs, mask, rays_o, rays_d, H, W, img_path)`` (provider.py:179-181):
train split draws a random image per step and has length ``train_size``
(provider.py:166-176).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class RayBatch:
    rgbs: np.ndarray       # [H*W, 3]
    mask: np.ndarray       # [H*W]
    rays_o: np.ndarray     # [H*W, 3]
    rays_d: np.ndarray     # [H*W, 3]
    H: int
    W: int
    img_path: str
    index: int


class Provider:
    """Base provider: subclasses fill images/masks/origins/directions."""

    def __init__(self, split: str, train_size: int, seed: int = 0):
        self.split = split
        self.train_size = train_size
        self.rng = np.random.RandomState(seed)
        # subclasses must set:
        self.images: List[np.ndarray] = []      # each [H, W, 3]
        self.masks: List[np.ndarray] = []       # each [H, W]
        self.origins: List[np.ndarray] = []     # each [H, W, 3]
        self.directions: List[np.ndarray] = []  # each [H, W, 3]
        self.images_lis: List[str] = []
        self.H: List[int] = []
        self.W: List[int] = []
        self.n_images = 0
        self._stacked = False

    def finalize(self, device_resident: bool = True):
        """Flatten per-image arrays to [n, H*W, c] stacks; optionally upload."""
        def stack(xs, ch):
            return np.stack([x.reshape(-1, ch) if ch else x.reshape(-1) for x in xs])

        self.n_images = len(self.origins)
        if self.images:
            self.images_flat = stack(self.images, 3).astype(np.float32)
            self.masks_flat = stack(self.masks, 0).astype(np.float32)
        else:  # test split with synthesized poses only
            hw = self.origins[0].shape[0] * self.origins[0].shape[1]
            self.images_flat = np.zeros((1, hw, 3), np.float32)
            self.masks_flat = np.zeros((1, hw), np.float32)
        self.origins_flat = stack(self.origins, 3).astype(np.float32)
        self.directions_flat = stack(self.directions, 3).astype(np.float32)
        if device_resident:
            self.images_flat = jax.device_put(self.images_flat)
            self.masks_flat = jax.device_put(self.masks_flat)
            self.origins_flat = jax.device_put(self.origins_flat)
            self.directions_flat = jax.device_put(self.directions_flat)
        self._stacked = True

    def __len__(self):
        if self.split == "train":
            return self.train_size
        return self.n_images

    def item(self, index: int) -> RayBatch:
        assert self._stacked, "call finalize() first"
        if self.split == "train":
            index = int(self.rng.randint(0, self.n_images))
        img_idx = 0 if self.split == "test" and len(self.images) <= 1 else index
        img_idx = min(img_idx, self.images_flat.shape[0] - 1)
        path = self.images_lis[index] if index < len(self.images_lis) else str(index)
        return RayBatch(
            rgbs=self.images_flat[img_idx],
            mask=self.masks_flat[img_idx],
            rays_o=self.origins_flat[index],
            rays_d=self.directions_flat[index],
            H=self.H[0],
            W=self.W[0],
            img_path=path,
            index=index,
        )

    def __iter__(self):
        for i in range(len(self)):
            yield self.item(i)


class NeRFDataset:
    """Facade dispatching dtu / nerfstudio / llff / synthetic providers
    (reference provider.py:643-696)."""

    def __init__(self, opt, type: str = "train", H: int = 256, W: int = 256,
                 size: int = 100, R_path: Optional[str] = None, device=None):
        self.opt = opt
        self.type = type
        self.training = type in ("train", "all")
        resolution_level = (
            opt.train_resolution_level if self.training else opt.eval_resolution_level
        )

        kw = dict(
            split=type,
            resolution_level=resolution_level,
            opt=opt,
            R_path=R_path,
        )
        if opt.data_type == "nerfstudio":
            from customnerf_tpu.data.nerfstudio import NerfstudioProvider
            self.dataset = NerfstudioProvider(data_dir=opt.data_path, **kw)
        elif opt.data_type == "dtu":
            from customnerf_tpu.data.dtu import DTUProvider
            self.dataset = DTUProvider(data_dir=opt.data_path, **kw)
        elif opt.data_type == "llff":
            from customnerf_tpu.data.llff import LLFFProvider
            self.dataset = LLFFProvider(data_dir=opt.data_path, **kw)
        elif opt.data_type == "synthetic":
            from customnerf_tpu.data.synthetic import SyntheticProvider
            self.dataset = SyntheticProvider(split=type, opt=opt)
        else:
            raise ValueError(f"unsupported data type {opt.data_type}")
        self.size = size

    def dataloader(self):
        return self.dataset
