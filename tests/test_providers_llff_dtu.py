"""LLFF + DTU providers on tiny generated scenes; NDC ray math."""

import os

import cv2
import numpy as np
import pytest

from customnerf_tpu.config import Config


def make_llff_scene(root, n=6, H=32, W=40):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "fg"), exist_ok=True)
    rng = np.random.RandomState(0)
    rows = []
    focal = 50.0
    for i in range(n):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", f"img{i}.jpg"), img)
        cv2.imwrite(os.path.join(root, "fg", f"img{i}.png"),
                    (rng.rand(H, W) > 0.5).astype(np.uint8) * 255)
        # forward-facing-ish pose: small rotations around z axis view
        from scipy.spatial.transform import Rotation
        R = Rotation.from_euler("xyz", rng.randn(3) * 0.05).as_matrix()
        t = np.array([0.1 * i, 0.0, 0.5])
        pose = np.concatenate([R, t[:, None]], axis=1)  # [3,4] right up back
        hwf = np.array([[H], [W], [focal]])
        row = np.concatenate([np.concatenate([pose, hwf], 1).reshape(-1),
                              [2.0, 6.0]])
        rows.append(row)
    np.save(os.path.join(root, "poses_bounds.npy"), np.stack(rows))


def test_llff_provider_ndc(tmp_path):
    root = str(tmp_path / "llff")
    make_llff_scene(root)
    opt = Config(data_type="llff", data_path=root, keyword="fg",
                 train_size=5, is360Scene=False)
    from customnerf_tpu.data.llff import LLFFProvider
    p = LLFFProvider(data_dir=root, split="train", resolution_level=1, opt=opt)
    assert p.n_images == 6
    b = p.item(0)
    o = np.asarray(b.rays_o)
    d = np.asarray(b.rays_d)
    # NDC: origins on the z=-... plane within the unit cube-ish range
    assert np.abs(o[:, 2]).max() <= 1.0 + 1e-4
    assert np.isfinite(o).all() and np.isfinite(d).all()

    # 360 mode: raw world rays, unit norm
    opt2 = Config(data_type="llff", data_path=root, keyword="fg",
                  train_size=5, is360Scene=True)
    p2 = LLFFProvider(data_dir=root, split="train", resolution_level=1, opt=opt2)
    d2 = np.asarray(p2.item(0).rays_d)
    np.testing.assert_allclose(np.linalg.norm(d2, axis=-1), 1.0, atol=1e-5)


def test_llff_test_split_spiral(tmp_path):
    root = str(tmp_path / "llff2")
    make_llff_scene(root)
    opt = Config(data_type="llff", data_path=root, keyword="fg")
    from customnerf_tpu.data.llff import LLFFProvider
    p = LLFFProvider(data_dir=root, split="test", resolution_level=1, opt=opt)
    assert len(p) == 120  # spiral path
    b = p.item(3)
    assert np.isfinite(np.asarray(b.rays_o)).all()


def test_dtu_provider(tmp_path):
    root = str(tmp_path / "dtu")
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    rng = np.random.RandomState(0)
    n, H, W = 4, 30, 40
    cams = {}
    K = np.array([[60.0, 0, W / 2, 0], [0, 60.0, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    for i in range(n):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "image", f"{i:03d}.png"), img)
        cv2.imwrite(os.path.join(root, "mask", f"{i:03d}.png"),
                    (rng.rand(H, W) > 0.5).astype(np.uint8) * 255)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        cams[f"world_mat_{i}"] = (K @ w2c).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(root, "cameras_sphere.npz"), **cams)

    opt = Config(data_type="dtu", data_path=root, if_sphere=True, train_size=3)
    from customnerf_tpu.data.dtu import DTUProvider
    p = DTUProvider(data_dir=root, split="train", resolution_level=1, opt=opt)
    assert p.n_images == 4
    b = p.item(0)
    d = np.asarray(b.rays_d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # camera centers recovered: all rays from one image share an origin
    o = np.asarray(b.rays_o).reshape(-1, 3)
    assert np.abs(o - o[0]).max() < 1e-4


def test_llff_native_decode_matches_cv2(tmp_path, monkeypatch):
    """LLFF's native decode path (bilinear resize in csrc/dataio.cpp) must
    reproduce the cv2 INTER_LINEAR loader within uint8 rounding."""
    from customnerf_tpu.utils import native

    if not native.has_image_codecs():
        pytest.skip("image codecs unavailable in this toolchain")
    root = str(tmp_path / "llff")
    make_llff_scene(root)
    opt = Config(data_type="llff", data_path=root, keyword="fg",
                 train_size=5, is360Scene=True)
    from customnerf_tpu.data.llff import LLFFProvider

    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "0")
    p_cv = LLFFProvider(data_dir=root, split="train", resolution_level=2,
                        opt=opt)
    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "1")
    p_nat = LLFFProvider(data_dir=root, split="train", resolution_level=2,
                         opt=opt)
    assert p_nat.H == p_cv.H and p_nat.W == p_cv.W
    for a, b in zip(p_nat.images, p_cv.images):
        np.testing.assert_allclose(a, b, atol=2.0 / 255.0)
    for a, b in zip(p_nat.masks, p_cv.masks):
        np.testing.assert_allclose(a, b, atol=2.0 / 255.0)


def test_dtu_native_decode_matches_cv2(tmp_path, monkeypatch):
    """DTU's native decode path (area resize) vs the cv2 loader."""
    from customnerf_tpu.utils import native

    if not native.has_image_codecs():
        pytest.skip("image codecs unavailable in this toolchain")
    root = str(tmp_path / "dtu")
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    rng = np.random.RandomState(1)
    n, H, W = 3, 30, 40
    cams = {}
    K = np.array([[60.0, 0, W / 2, 0], [0, 60.0, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    from scipy.spatial.transform import Rotation
    for i in range(n):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "image", f"{i:03d}.png"), img)
        cv2.imwrite(os.path.join(root, "mask", f"{i:03d}.png"),
                    (rng.rand(H, W) > 0.5).astype(np.uint8) * 255)
        R = Rotation.random(random_state=rng).as_matrix()
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = rng.randn(3)
        cams[f"world_mat_{i}"] = (K @ w2c).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(root, "cameras_sphere.npz"), **cams)

    opt = Config(data_type="dtu", data_path=root, if_sphere=True, train_size=3)
    from customnerf_tpu.data.dtu import DTUProvider

    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "0")
    p_cv = DTUProvider(data_dir=root, split="train", resolution_level=2,
                       opt=opt)
    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "1")
    p_nat = DTUProvider(data_dir=root, split="train", resolution_level=2,
                        opt=opt)
    assert p_nat.H == p_cv.H and p_nat.W == p_cv.W
    for a, b in zip(p_nat.images, p_cv.images):
        np.testing.assert_allclose(a, b, atol=2.0 / 256.0)
    for a, b in zip(p_nat.masks, p_cv.masks):
        # thresholded {0, 1} masks: boundary texels may round differently
        assert np.mean(np.asarray(a) != np.asarray(b)) < 0.02


def test_facade_dispatch(tmp_path):
    opt = Config(data_type="synthetic", train_size=3)
    from customnerf_tpu.data.base import NeRFDataset
    ds = NeRFDataset(opt, type="train")
    assert len(ds.dataloader()) == 3
    with pytest.raises(ValueError):
        NeRFDataset(Config(data_type="nope"), type="train")
