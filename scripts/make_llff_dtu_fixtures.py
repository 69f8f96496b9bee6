"""Generate LLFF- and DTU-format bear-class fixtures (VERDICT r4 next #4).

The reference treats LLFF (``nerf/llff.py:285-377``, poses_bounds.npy +
NDC forward-facing rays) and DTU (``nerf/provider.py:496-640``,
cameras_sphere.npz projection matrices) as first-class data formats, but
neither had end-to-end quality evidence here — only loader unit tests.
This renders the same deterministic bear scene as
``scripts/make_bear_fixture.py`` into both layouts so the real CLI can run
full reconstructions against them and gate PSNR (docs/PARITY.md).

Pixel conventions match each loader exactly (the scene a NeRF can fit is
whatever is multi-view-consistent under the loader's OWN ray model):

  * LLFF: ``dir_cam = [(c−W/2)/f, −(r−H/2)/f, −1]`` (data/llff.py:53-57),
    poses stored in the LLFF "down right back" column order that the loader
    permutes back via ``[col1, −col0, col2]`` (data/llff.py:149-150), hwf
    in the 5th column, ``[near, far]`` appended.
  * DTU: ``dir_cam = normalize(K⁻¹ @ [c, r, 1])`` with no half-pixel
    offset (data/dtu.py:121-125), OpenCV-convention (+z forward) pose,
    ``world_mat = K₄ @ w2c`` and a ``scale_mat`` normalizing the object
    into the unit sphere.

Usage: python scripts/make_llff_dtu_fixtures.py [out_root] [n_views] [W] [H]
Writes {out_root}/llff and {out_root}/dtu (defaults /tmp/bear_llff_dtu, 24
views, 400×300).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_bear_fixture import look_at, trace  # noqa: E402

KEYWORD = "lang_bear"
TARGET = np.asarray([0.0, 0.1, 0.4])


def _render_view(c2w_gl, W, H, fl, cx, cy, offset=0.5):
    """Trace one view with the OpenGL convention (−z forward) and the given
    half-pixel offset."""
    i, j = np.meshgrid(np.arange(W), np.arange(H))
    x = i.reshape(-1) + offset
    y = j.reshape(-1) + offset
    dirs_cam = np.stack([(x - cx) / fl, -(y - cy) / fl, -np.ones_like(x)], -1)
    d = dirs_cam @ c2w_gl[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(c2w_gl[:3, 3][None], (d.shape[0], 1))
    rgb, mask = trace(o, d)
    return (rgb.reshape(H, W, 3), mask.reshape(H, W))


def _write_view(out, name, rgb, mask):
    import cv2

    cv2.imwrite(os.path.join(out, "images", name),
                cv2.cvtColor((rgb * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(out, KEYWORD, name),
                (mask * 255).astype(np.uint8))


def make_llff(out, n_views=24, W=400, H=300, fl=350.0):
    """Forward-facing rig → poses_bounds.npy (llff.py loader contract)."""
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    os.makedirs(os.path.join(out, KEYWORD), exist_ok=True)
    cx, cy = W / 2.0, H / 2.0

    rows = []
    rng = np.random.RandomState(7)
    for vi in range(n_views):
        # cameras on a gently-jittered plane in front of the bear, all
        # looking roughly at it — the forward-facing regime NDC assumes
        gx = 0.45 * np.cos(2 * np.pi * vi / n_views)
        gz = 0.30 * np.sin(2 * np.pi * vi / n_views)
        eye = np.asarray([gx + 0.05 * rng.randn(),
                          -2.6 + 0.1 * rng.randn(),
                          0.55 + gz])
        c2w = look_at(eye, TARGET)  # OpenGL: columns [right, up, back]

        rgb, mask = _render_view(c2w, W, H, fl, cx, cy, offset=0.0)
        _write_view(out, f"frame_{vi:05d}.png", rgb, mask)

        # store LLFF column order: loader's permutation new=[c1,−c0,c2,c3]
        # inverts to old=[−up, right, back, t]
        r, u, b, t = (c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3])
        pose_llff = np.stack([-u, r, b, t], axis=1)           # [3, 4]
        hwf = np.asarray([[H], [W], [fl]], np.float64)        # [3, 1]
        # near/far along the view: scene content spans ~[origin−1, origin+1]
        dist = np.linalg.norm(TARGET - eye)
        rows.append(np.concatenate(
            [np.concatenate([pose_llff, hwf], axis=1).reshape(-1),
             [dist - 1.2, dist + 1.6]]))
    np.save(os.path.join(out, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"wrote LLFF fixture: {n_views} views at {out}")


def _lookat_opencv(eye, target, up=np.asarray([0.0, 0.0, 1.0])):
    """OpenCV c2w: +x right, +y down, +z forward."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)   # OpenGL up
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, -u, f, eye
    return c2w


def make_dtu(out, n_views=24, W=400, H=300, fl=350.0):
    """Orbit rig → cameras_sphere.npz / cameras_large.npz projection
    matrices (provider.py:496-640 contract: P = world_mat @ scale_mat)."""
    import cv2

    os.makedirs(os.path.join(out, "image"), exist_ok=True)
    os.makedirs(os.path.join(out, "mask"), exist_ok=True)
    cx, cy = W / 2.0, H / 2.0
    K = np.asarray([[fl, 0, cx], [0, fl, cy], [0, 0, 1.0]])
    K4 = np.eye(4)
    K4[:3, :3] = K

    # object → unit sphere: X_world = scale_mat @ X_new
    s = 1.2
    scale_mat = np.diag([s, s, s, 1.0])
    scale_mat[:3, 3] = TARGET

    cams = {}
    for vi in range(n_views):
        ang = 2 * np.pi * vi / n_views
        elev = 0.45 + 0.15 * np.sin(3 * ang)
        radius = 2.2 + 0.2 * np.cos(2 * ang)
        eye = np.asarray([radius * np.cos(ang) * np.cos(elev),
                          radius * np.sin(ang) * np.cos(elev),
                          0.5 + radius * np.sin(elev)])
        c2w_cv = _lookat_opencv(eye, TARGET)

        # render with the DTU loader's convention: dir = K⁻¹[c, r, 1], no
        # half-pixel offset, OpenCV axes
        i, j = np.meshgrid(np.arange(W), np.arange(H))
        pix = np.stack([i.reshape(-1), j.reshape(-1),
                        np.ones(H * W)], -1)  # [N, 3] = [c, r, 1]
        dirs_cam = pix @ np.linalg.inv(K).T
        dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
        d = dirs_cam @ c2w_cv[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(c2w_cv[:3, 3][None], (d.shape[0], 1))
        rgb, mask = trace(o, d)

        name = f"{vi:06d}.png"
        cv2.imwrite(os.path.join(out, "image", name),
                    cv2.cvtColor((rgb.reshape(H, W, 3) * 255).astype(
                        np.uint8), cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(out, "mask", name),
                    (mask.reshape(H, W) * 255).astype(np.uint8))

        w2c = np.linalg.inv(c2w_cv)
        cams[f"world_mat_{vi}"] = (K4 @ w2c).astype(np.float64)
        cams[f"scale_mat_{vi}"] = scale_mat.astype(np.float64)

    np.savez(os.path.join(out, "cameras_sphere.npz"), **cams)
    np.savez(os.path.join(out, "cameras_large.npz"), **cams)
    print(f"wrote DTU fixture: {n_views} views at {out}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bear_llff_dtu"
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    make_llff(os.path.join(root, "llff"), n_views, W, H)
    make_dtu(os.path.join(root, "dtu"), n_views, W, H)


if __name__ == "__main__":
    main()
