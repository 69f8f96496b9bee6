"""Data providers: synthetic contract + nerfstudio golden math vs the
reference's own (torch) pose utilities re-run on the fly."""

import json
import os

import numpy as np
import pytest

from customnerf_tpu.config import Config
from customnerf_tpu.data.camera import (
    auto_orient_and_center_poses,
    inter_pose,
    radial_and_tangential_undistort,
)
from customnerf_tpu.data.synthetic import SyntheticProvider


def random_poses(n=6, seed=0):
    rng = np.random.RandomState(seed)
    poses = []
    for _ in range(n):
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R
        m[:3, 3] = t
        poses.append(m)
    return np.stack(poses)


def test_auto_orient_up_aligns_mean_up_with_z():
    poses = random_poses()
    oriented, transform = auto_orient_and_center_poses(poses, method="up")
    up = oriented[:, :3, 1].mean(axis=0)
    up = up / np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
    # centered
    np.testing.assert_allclose(oriented[:, :3, 3].mean(axis=0), 0, atol=1e-5)


def test_auto_orient_matches_torch_reference_math():
    """Cross-check against an independent torch implementation of the same
    formula (mirrors nerf/provider_utils.py:60-115 behavior)."""
    import torch

    poses = random_poses(8, seed=3)
    ours, _ = auto_orient_and_center_poses(poses, method="up")

    tposes = torch.tensor(poses)
    up = tposes[:, :3, 1].mean(0)
    up = up / torch.linalg.norm(up)
    a, b = up, torch.tensor([0.0, 0.0, 1.0])
    v = torch.linalg.cross(a, b)
    c = torch.dot(a, b)
    s = torch.linalg.norm(v)
    skew = torch.tensor([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    rot = torch.eye(3) + skew + skew @ skew * ((1 - c) / (s ** 2 + 1e-8))
    translation = tposes[:, :3, 3].mean(0)
    transform = torch.cat([rot, rot @ -translation[..., None]], dim=-1)
    want = (transform @ tposes).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_inter_pose_endpoints():
    poses = random_poses(2, seed=1)
    p0 = inter_pose(poses[0], poses[1], 0.0)
    p1 = inter_pose(poses[0], poses[1], 1.0)
    np.testing.assert_allclose(p0, poses[0], atol=1e-4)
    np.testing.assert_allclose(p1, poses[1], atol=1e-4)
    # midpoint is a valid rigid transform
    mid = inter_pose(poses[0], poses[1], 0.5)
    R = mid[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_undistort_roundtrip():
    rng = np.random.RandomState(0)
    params = np.tile(np.array([0.05, -0.01, 0.0, 0.0, 0.001, -0.002],
                              np.float32), (64, 1))
    undistorted_gt = rng.randn(64, 2).astype(np.float32) * 0.3

    # forward-distort
    x, y = undistorted_gt[:, 0], undistorted_gt[:, 1]
    r2 = x * x + y * y
    k1, k2, k3, k4, p1, p2 = params.T
    d = 1 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = d * x + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = d * y + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
    distorted = np.stack([xd, yd], -1)

    recovered = radial_and_tangential_undistort(distorted, params)
    np.testing.assert_allclose(recovered, undistorted_gt, atol=1e-5)


def test_synthetic_provider_contract():
    opt = Config(data_type="synthetic", train_size=7)
    p = SyntheticProvider(split="train", opt=opt)
    assert len(p) == 7
    b = p.item(0)
    hw = b.H * b.W
    assert b.rgbs.shape == (hw, 3)
    assert b.mask.shape == (hw,)
    assert b.rays_o.shape == (hw, 3)
    assert b.rays_d.shape == (hw, 3)
    # directions unit norm
    n = np.linalg.norm(np.asarray(b.rays_d), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    # sphere visible: mask covers a sane fraction
    assert 0.05 < float(np.asarray(b.mask).mean()) < 0.8


def _write_mini_scene(d, rng, n=5, h=48, w=64):
    import cv2

    (d / "images").mkdir(parents=True)
    (d / "fg").mkdir()
    frames = []
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "images" / f"frame_{i:03d}.jpg"), img)
        cv2.imwrite(str(d / "fg" / f"frame_{i:03d}.png"),
                    (rng.rand(h, w) > 0.5).astype(np.uint8) * 255)
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 1.0 + 0.1 * i]
        frames.append({"file_path": f"images/frame_{i:03d}.jpg",
                       "transform_matrix": c2w.tolist()})
    meta = {"fl_x": 60.0, "fl_y": 60.0, "cx": w / 2.0, "cy": h / 2.0,
            "w": w, "h": h, "frames": frames}
    with open(d / "transforms.json", "w") as f:
        json.dump(meta, f)


def test_native_decode_matches_cv2_loader(tmp_path, monkeypatch):
    """The C++ batch decoder (libjpeg/libpng + area resize,
    csrc/dataio.cpp) must reproduce the cv2 loading path: images within
    resize-rounding, masks exactly (post-threshold)."""
    import pytest

    from customnerf_tpu.utils import native

    if not native.has_image_codecs():
        pytest.skip("image codecs unavailable in this toolchain")

    d = tmp_path / "scene"
    _write_mini_scene(d, np.random.RandomState(3))
    from customnerf_tpu.data.nerfstudio import NerfstudioProvider

    opt = Config(data_type="nerfstudio", data_path=str(d), keyword="fg",
                 train_resolution_level=2, train_size=11)

    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "0")
    p_cv = NerfstudioProvider(data_dir=str(d), split="train",
                              resolution_level=2, opt=opt)
    monkeypatch.setenv("CUSTOMNERF_NATIVE_DECODE", "1")
    p_nat = NerfstudioProvider(data_dir=str(d), split="train",
                               resolution_level=2, opt=opt)

    assert p_nat.H == p_cv.H and p_nat.W == p_cv.W
    for a, b in zip(p_nat.images, p_cv.images):
        np.testing.assert_allclose(a, b, atol=2.0 / 256.0)
    for a, b in zip(p_nat.masks, p_cv.masks):
        # thresholded {0, 1} masks must agree except at resize-boundary
        # texels whose fractional coverage rounds differently
        assert np.mean(a != b) < 0.02


def test_nerfstudio_provider_loads_mini_scene(tmp_path):
    """Build a tiny on-disk nerfstudio scene and load it."""
    import cv2

    d = tmp_path / "scene"
    (d / "images").mkdir(parents=True)
    (d / "fg").mkdir()
    rng = np.random.RandomState(0)
    frames = []
    for i in range(5):
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "images" / f"frame_{i:03d}.jpg"), img)
        cv2.imwrite(str(d / "fg" / f"frame_{i:03d}.png"),
                    (rng.rand(48, 64) > 0.5).astype(np.uint8) * 255)
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 1.0 + 0.1 * i]
        frames.append({"file_path": f"images/frame_{i:03d}.jpg",
                       "transform_matrix": c2w.tolist()})
    meta = {"fl_x": 60.0, "fl_y": 60.0, "cx": 32.0, "cy": 24.0,
            "w": 64, "h": 48, "frames": frames}
    with open(d / "transforms.json", "w") as f:
        json.dump(meta, f)

    opt = Config(data_type="nerfstudio", data_path=str(d), keyword="fg",
                 train_resolution_level=1, train_size=11)
    from customnerf_tpu.data.nerfstudio import NerfstudioProvider
    p = NerfstudioProvider(data_dir=str(d), split="train",
                           resolution_level=1, opt=opt)
    # 90% split of 5 → 5 images (ceil(4.5)=5)
    assert p.n_images == 5
    b = p.item(0)
    assert b.rgbs.shape == (48 * 64, 3)
    n = np.linalg.norm(np.asarray(b.rays_d), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    # poses were normalized: origins within unit-ish ball
    assert float(np.abs(np.asarray(b.rays_o)).max()) <= 1.5


def test_get_rays_full_and_subsample():
    """get_rays (torch-ngp API parity, reference provider_utils.py:238-302):
    full-res rays, uniform subsample, and error-map importance sampling."""
    from customnerf_tpu.data.camera import get_rays

    H, W = 36, 48
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.3, -0.2, 1.0]
    poses = pose[None]

    # full resolution: one unit ray per pixel, origins = camera center
    out = get_rays(poses, (fx, fy, cx, cy), H, W)
    assert out["rays_d"].shape == (1, H * W, 3)
    np.testing.assert_allclose(np.linalg.norm(out["rays_d"], axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(out["rays_o"][0, 0], pose[:3, 3], atol=1e-6)
    # the center pixel's ray is ~the +z camera axis (torch-ngp convention)
    center = out["rays_d"][0, (H // 2) * W + W // 2]
    assert center[2] > 0.99

    # uniform subsample: N rays, inds consistent with the full-res set
    rng = np.random.RandomState(0)
    sub = get_rays(poses, (fx, fy, cx, cy), H, W, N=64, rng=rng)
    assert sub["rays_d"].shape == (1, 64, 3)
    np.testing.assert_allclose(sub["rays_d"][0],
                               out["rays_d"][0][sub["inds"][0]], atol=1e-6)

    # error map concentrated on one coarse cell → every sampled pixel falls
    # inside that cell's fine-res footprint (jitter stays in-cell)
    em = np.full((1, 128 * 128), 1e-12, np.float64)
    cell_x, cell_y = 40, 100  # coarse (row, col)
    em[0, cell_x * 128 + cell_y] = 1.0
    # multinomial is without replacement: ask for 1 ray many times
    xs, ys = [], []
    imp = get_rays(poses, (fx, fy, cx, cy), H, W, N=1, error_map=em, rng=rng)
    assert imp["inds_coarse"].shape == (1, 1)
    assert imp["inds_coarse"][0, 0] == cell_x * 128 + cell_y
    ind = imp["inds"][0, 0]
    px, py = ind // W, ind % W
    sx, sy = H / 128.0, W / 128.0
    assert int(cell_x * sx) <= px <= min(int((cell_x + 1) * sx), H - 1)
    assert int(cell_y * sy) <= py <= min(int((cell_y + 1) * sy), W - 1)
