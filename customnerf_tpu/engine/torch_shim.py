"""Import shim for *reference-format* checkpoints (torch-ngp/tcnn .pth).

Maps a checkpoint produced by the reference pipeline into our param tree so
``--editing_from`` can start from a reference reconstruction
(SURVEY.md §7 "checkpoint compatibility"):

  * ``pos_en.embeddings`` [offset, 2]  →  ``grid_table`` directly — both use
    the identical offsets table (tested: test_grid_encode.py
    ``test_offsets_match_reference_formula``).
  * tcnn ``network.params`` / ``density_network.params`` /
    ``rgb_network.params`` are flat fp16 vectors.  tcnn's FullyFusedMLP packs
    per-layer matrices consecutively, each stored as
    ``[n_neurons, input_width_padded_to_16]`` row-major, inputs padded with
    zeros.  We unpack under that documented assumption (validated
    structurally by total-size checks; a mismatted layout fails loudly).

Our own checkpoints round-trip natively (engine/checkpoint.py) — this shim
is only for crossing over from a reference run.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


def _pad16(n: int) -> int:
    return ((n + 15) // 16) * 16


def _unpack_tcnn(flat: np.ndarray, dims: List[int]) -> List[np.ndarray]:
    """dims = [in, hidden, ..., out]; returns per-layer [in_i, out_i] kernels
    (transposed to our x@W convention, unpadded)."""
    kernels = []
    off = 0
    widths = list(dims)
    for i in range(len(widths) - 1):
        in_w, out_w = widths[i], widths[i + 1]
        in_pad = _pad16(in_w)
        out_pad = _pad16(out_w) if i == len(widths) - 2 else out_w
        n = out_pad * in_pad
        if off + n > flat.size:
            raise ValueError(
                f"tcnn layout mismatch: layer {i} needs {n} params, "
                f"{flat.size - off} left")
        w = flat[off:off + n].reshape(out_pad, in_pad)
        kernels.append(np.ascontiguousarray(w[:out_w, :in_w].T))
        off += n
    return kernels


def import_reference_checkpoint(path: str, conf_channels: int = 1) -> Dict:
    """Reference .pth → our flax param tree.

    Handles the fused rgb head (``rgb_network.params``,
    network_grid.py:118-128) AND the ``RGB_network`` split-head variants
    (``--detach_mask_from_field`` / ``--mask_no_dir``,
    network_grid.py:13-68), whose checkpoints carry
    ``rgb_network.rgb_network.params`` + ``rgb_network.conf_network.params``.
    The conf net's input width (91 = dir-embed+feature vs 64 = feature-only
    under mask_no_dir) is inferred from the flat vector's size;
    ``conf_channels`` (1, or 2 with keyword2) cannot be inferred — tcnn pads
    outputs to 16 — so the caller passes it.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    table = sd["pos_en.embeddings"].astype(np.float32)

    feat = _unpack_tcnn(sd["network.params"], [32, 64, 64, 64])
    dens = _unpack_tcnn(sd["density_network.params"], [64, 64, 1])

    def k(w):
        return {"kernel": jnp.asarray(w)}

    params = {
        "grid_table": jnp.asarray(table),
        "feature_net": {"hidden_0": k(feat[0]), "hidden_1": k(feat[1]),
                        "out": k(feat[2])},
        "density_net": {"hidden_0": k(dens[0]), "out": k(dens[1])},
    }
    if "rgb_network.params" in sd:
        rgb = _unpack_tcnn(sd["rgb_network.params"],
                           [27 + 64, 64, 3 + conf_channels])
        params["rgb_net"] = {"hidden_0": k(rgb[0]), "out": k(rgb[1])}
    elif "rgb_network.rgb_network.params" in sd:
        rgb = _unpack_tcnn(sd["rgb_network.rgb_network.params"],
                           [27 + 64, 64, 3])
        conf_flat = sd["rgb_network.conf_network.params"]
        # size = 64·pad16(in) + pad16(out)·64 → 7168 for in=91, 5120 for 64
        conf_in = 27 + 64 if conf_flat.size == 64 * _pad16(27 + 64) + \
            16 * 64 else 64
        conf = _unpack_tcnn(conf_flat, [conf_in, 64, conf_channels])
        params["rgb_net"] = {"hidden_0": k(rgb[0]), "out": k(rgb[1])}
        params["conf_net"] = {"hidden_0": k(conf[0]), "out": k(conf[1])}
    else:
        raise ValueError(
            f"unrecognized reference rgb head layout in {path}: "
            f"{sorted(kk for kk in sd if 'rgb' in kk)}")
    return {"params": params}


def export_reference_checkpoint(params, path: str, epoch: int = 0,
                                global_step: int = 0):
    """Our params → a reference-shaped .pth (tcnn flat packing), so
    reference tooling can consume checkpoints trained here.  Split-head
    trees (conf_net present) export the RGB_network layout
    (network_grid.py:13-68)."""
    import torch

    p = params["params"]

    def pack(kernels_dims):
        parts = []
        for w, (in_w, out_w, is_last) in kernels_dims:
            w = np.asarray(w, np.float32).T  # [out, in]
            in_pad = _pad16(in_w)
            out_pad = _pad16(out_w) if is_last else out_w
            buf = np.zeros((out_pad, in_pad), np.float32)
            buf[:out_w, :in_w] = w
            parts.append(buf.reshape(-1))
        return np.concatenate(parts)

    feat = pack([
        (p["feature_net"]["hidden_0"]["kernel"], (32, 64, False)),
        (p["feature_net"]["hidden_1"]["kernel"], (64, 64, False)),
        (p["feature_net"]["out"]["kernel"], (64, 64, True)),
    ])
    dens = pack([
        (p["density_net"]["hidden_0"]["kernel"], (64, 64, False)),
        (p["density_net"]["out"]["kernel"], (64, 1, True)),
    ])
    out_rgb = np.asarray(p["rgb_net"]["out"]["kernel"]).shape[-1]
    rgb_in = np.asarray(p["rgb_net"]["hidden_0"]["kernel"]).shape[0]
    rgb = pack([
        (p["rgb_net"]["hidden_0"]["kernel"], (rgb_in, 64, False)),
        (p["rgb_net"]["out"]["kernel"], (64, out_rgb, True)),
    ])

    model = {
        "pos_en.embeddings": torch.from_numpy(
            np.asarray(p["grid_table"], np.float32)),
        "network.params": torch.from_numpy(feat),
        "density_network.params": torch.from_numpy(dens),
    }
    if "conf_net" in p:
        conf_in = np.asarray(p["conf_net"]["hidden_0"]["kernel"]).shape[0]
        conf_out = np.asarray(p["conf_net"]["out"]["kernel"]).shape[-1]
        conf = pack([
            (p["conf_net"]["hidden_0"]["kernel"], (conf_in, 64, False)),
            (p["conf_net"]["out"]["kernel"], (64, conf_out, True)),
        ])
        model["rgb_network.rgb_network.params"] = torch.from_numpy(rgb)
        model["rgb_network.conf_network.params"] = torch.from_numpy(conf)
    else:
        model["rgb_network.params"] = torch.from_numpy(rgb)

    state = {
        "epoch": epoch,
        "global_step": global_step,
        "stats": {"loss": [], "valid_loss": [], "results": [],
                  "checkpoints": [], "best_result": None},
        "model": model,
    }
    torch.save(state, path)
    return path
