"""Generate a bear-class nerfstudio-format fixture (VERDICT r1 missing #6).

The real bear capture is not present in this environment, so this renders a
deterministic, realistic stand-in with the same data contract the reference
consumes (``nerf/provider.py:183-470``): multi-view posed RGB images of an
object on a textured ground under a gradient sky, Grounded-SAM-style binary
object masks in an ``images→{keyword}`` sibling directory, and a
``transforms.json`` with shared pinhole intrinsics and OpenGL c2w poses
(the convention data/nerfstudio.py's ray generator expects:
``dirs_cam = [(x−cx)/fx, −(y−cy)/fy, −1]``).

Scene: a two-sphere "bear" (body+head, brown with value-noise fur) on a
green/tan checker plane, Lambert-shaded from a fixed sun, view-consistent —
i.e. exactly the kind of content a NeRF can fit, with real high-frequency
texture so PSNR numbers are meaningful.

Usage: python scripts/make_bear_fixture.py [out_dir] [n_views] [W] [H]
"""

import json
import os
import sys

import numpy as np


def _hash3(p):
    """Deterministic value noise from integer 3-D lattice points."""
    x = (p[..., 0] * 127.1 + p[..., 1] * 311.7 + p[..., 2] * 74.7)
    return np.modf(np.sin(x) * 43758.5453)[0] * 0.5 + 0.5


def value_noise(p):
    pi = np.floor(p)
    pf = p - pi
    w = pf * pf * (3 - 2 * pf)

    def corner(dx, dy, dz):
        return _hash3(pi + np.asarray([dx, dy, dz]))

    nx00 = corner(0, 0, 0) * (1 - w[..., 0]) + corner(1, 0, 0) * w[..., 0]
    nx10 = corner(0, 1, 0) * (1 - w[..., 0]) + corner(1, 1, 0) * w[..., 0]
    nx01 = corner(0, 0, 1) * (1 - w[..., 0]) + corner(1, 0, 1) * w[..., 0]
    nx11 = corner(0, 1, 1) * (1 - w[..., 0]) + corner(1, 1, 1) * w[..., 0]
    ny0 = nx00 * (1 - w[..., 1]) + nx10 * w[..., 1]
    ny1 = nx01 * (1 - w[..., 1]) + nx11 * w[..., 1]
    return ny0 * (1 - w[..., 2]) + ny1 * w[..., 2]


SPHERES = [  # center, radius, base color (the bear)
    (np.asarray([0.0, 0.0, 0.30]), 0.34, np.asarray([0.45, 0.30, 0.18])),
    (np.asarray([0.0, 0.26, 0.66]), 0.20, np.asarray([0.50, 0.34, 0.20])),
    (np.asarray([-0.12, 0.38, 0.80]), 0.07, np.asarray([0.35, 0.22, 0.12])),
    (np.asarray([0.12, 0.38, 0.80]), 0.07, np.asarray([0.35, 0.22, 0.12])),
]
SUN = np.asarray([0.4, -0.5, 0.76])
SUN = SUN / np.linalg.norm(SUN)


def trace(o, d):
    """o [N,3] origins, d [N,3] dirs → rgb [N,3], mask [N] (bear hit)."""
    N = o.shape[0]
    t_best = np.full(N, np.inf)
    rgb = np.zeros((N, 3))
    mask = np.zeros(N, bool)

    # ground plane z=0 (checker + noise)
    dz = d[:, 2]
    t_pl = np.where(np.abs(dz) > 1e-6, -o[:, 2] / np.where(dz == 0, 1, dz), np.inf)
    hit_pl = (t_pl > 1e-3) & (t_pl < t_best)
    p = o + t_pl[:, None] * d
    checker = ((np.floor(p[:, 0] * 2.5) + np.floor(p[:, 1] * 2.5)) % 2)
    gcol = np.where(checker[:, None] > 0.5,
                    np.asarray([[0.25, 0.45, 0.18]]),
                    np.asarray([[0.55, 0.48, 0.30]]))
    gcol = gcol * (0.8 + 0.4 * value_noise(p * 7.0)[:, None])
    rgb = np.where(hit_pl[:, None], gcol, rgb)
    t_best = np.where(hit_pl, t_pl, t_best)

    # bear spheres (fur = noise-modulated albedo, Lambert shading)
    for c, r, base in SPHERES:
        oc = o - c
        b = np.sum(oc * d, -1)
        disc = b * b - (np.sum(oc * oc, -1) - r * r)
        ok = disc > 0
        t_s = np.where(ok, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        hit = ok & (t_s > 1e-3) & (t_s < t_best)
        p = o + t_s[:, None] * d
        n = (p - c) / r
        lam = np.clip(np.sum(n * SUN, -1), 0.15, 1.0)
        fur = 0.75 + 0.5 * value_noise(p * 24.0)
        col = base[None] * (lam * fur)[:, None]
        rgb = np.where(hit[:, None], col, rgb)
        mask = mask | hit
        t_best = np.where(hit, t_s, t_best)

    # sky gradient for misses
    sky = (np.asarray([[0.55, 0.70, 0.92]]) * (0.5 + 0.5 * d[:, 2:3])
           + np.asarray([[0.9, 0.9, 0.95]]) * (0.5 - 0.5 * d[:, 2:3]))
    rgb = np.where(np.isinf(t_best)[:, None], sky, rgb)
    return np.clip(rgb, 0, 1), mask


def look_at(eye, target, up=np.asarray([0.0, 0.0, 1.0])):
    """OpenGL c2w: camera looks down its −Z axis."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, -f, eye
    return c2w


def main():
    import cv2

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bear_fixture"
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    keyword = "lang_bear"
    fl, cx, cy = 350.0, W / 2.0, H / 2.0

    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    os.makedirs(os.path.join(out, keyword), exist_ok=True)

    frames = []
    target = np.asarray([0.0, 0.1, 0.4])
    for vi in range(n_views):
        ang = 2 * np.pi * vi / n_views
        elev = 0.45 + 0.15 * np.sin(3 * ang)      # vary elevation a bit
        radius = 2.2 + 0.2 * np.cos(2 * ang)
        eye = np.asarray([radius * np.cos(ang) * np.cos(elev),
                          radius * np.sin(ang) * np.cos(elev),
                          0.5 + radius * np.sin(elev)])
        c2w = look_at(eye, target)

        i, j = np.meshgrid(np.arange(W), np.arange(H))  # [H, W]
        x = i.reshape(-1) + 0.5
        y = j.reshape(-1) + 0.5
        dirs_cam = np.stack([(x - cx) / fl, -(y - cy) / fl,
                             -np.ones_like(x)], -1)
        d = dirs_cam @ c2w[:3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(c2w[:3, 3][None], (d.shape[0], 1))

        rgb, mask = trace(o, d)
        img = (rgb.reshape(H, W, 3) * 255).astype(np.uint8)
        msk = (mask.reshape(H, W) * 255).astype(np.uint8)
        name = f"frame_{vi:05d}.png"
        cv2.imwrite(os.path.join(out, "images", name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(out, keyword, name), msk)
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": c2w.tolist()})

    meta = {"fl_x": fl, "fl_y": fl, "cx": cx, "cy": cy, "w": W, "h": H,
            "camera_model": "OPENCV", "frames": frames}
    with open(os.path.join(out, "transforms.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {n_views} views to {out}")


if __name__ == "__main__":
    main()
