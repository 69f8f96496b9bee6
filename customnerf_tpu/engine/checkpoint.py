"""Checkpoint I/O preserving the reference on-disk contract.

Same format family as the reference (SURVEY.md §5.4): a single ``.pth``
torch-pickle dict with keys ``epoch``, ``global_step``, ``stats``, ``model``
(+ ``optimizer`` when full), files named ``df_ep{epoch:04d}.pth`` under
``{workspace}/checkpoints``, a 5-deep ring buffer that spares ``*0.pth``
(reference ``nerf/utils_init_nerf.py:779-900``).

``model`` is a flat ``{dotted/path: torch.Tensor}`` dict of the JAX param
pytree, so reference-style tooling (torch.load, key inspection) works
unchanged.  Optimizer state is stored as the same flat-numpy encoding plus a
treedef pickle — JAX-side only.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import torch


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", jax.tree_util.tree_map(np.asarray, _to_builtin(tree)))
    return flat


def _to_builtin(tree):
    """FrozenDict → dict recursively."""
    if hasattr(tree, "items"):
        return {k: _to_builtin(v) for k, v in tree.items()}
    return tree


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_checkpoint(
    path: str,
    params,
    epoch: int,
    global_step: int,
    stats: dict,
    opt_state=None,
    extra: Optional[dict] = None,
):
    state: Dict[str, Any] = {
        "epoch": epoch,
        "global_step": global_step,
        "stats": stats,
    }
    # One pipelined D2H for the whole tree: device_get issues
    # copy_to_host_async on every leaf before materializing, so the tunnel
    # streams the transfers instead of paying one blocking RTT per leaf
    # (the per-leaf np.asarray in _flatten dominated eval-epoch wall time
    # on the v5e tunnel — docs/PERF.md "Full-run wall time").
    params = jax.device_get(params)
    state["model"] = {
        k: torch.from_numpy(np.asarray(v).copy()) for k, v in _flatten(params).items()
    }
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        state["optimizer"] = {
            "leaves": [np.asarray(l) for l in jax.device_get(leaves)],
            "treedef": pickle.dumps(treedef),
        }
    if extra:
        extra = dict(extra)
        # the reference registers density_grid/density_bitfield as MODEL
        # buffers (nerf/renderer.py:235-236), so they live under
        # state['model'] in its .pth — mirror that layout so reference
        # tooling (and our own reference-import path) finds them
        for k in ("density_grid", "density_bitfield"):
            if extra.get(k) is not None:
                state["model"][k] = torch.from_numpy(
                    np.asarray(extra.pop(k)).copy())
        state.update(extra)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(state, path)
    return path


# occupancy-grid keys persisted for cuda_ray parity (SURVEY §5.4): arrays
# live under model (reference buffer layout), scalars at top level
_OCC_ARRAY_KEYS = ("density_grid", "density_bitfield")
_OCC_SCALAR_KEYS = ("mean_count", "mean_density", "iter_density")


def load_checkpoint(path: str, opt_state_template=None,
                    conf_channels: int = 1) -> Tuple[dict, dict]:
    """Returns (params_tree, meta).  meta has epoch/global_step/stats and
    optionally 'opt_state' restored against the template's treedef."""
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model" not in ckpt:
        params = _unflatten({k: v.numpy() for k, v in ckpt.items()})
        return params, {}
    model_sd = dict(ckpt["model"])
    occ_meta = {}
    for k in _OCC_ARRAY_KEYS:
        if k in model_sd:
            v = model_sd.pop(k)
            occ_meta[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    for k in _OCC_ARRAY_KEYS + _OCC_SCALAR_KEYS:  # legacy r3 top-level layout
        if k not in occ_meta and k in ckpt:
            occ_meta[k] = ckpt[k]
    if any(k.endswith(".params") for k in model_sd) or \
            "pos_en.embeddings" in model_sd:
        # reference-format checkpoint (torch-ngp/tcnn flat-vector layout):
        # convert (detection is structural — any tcnn `*.params` key —
        # so RGB_network variant checkpoints route through the shim too,
        # reference nerf/network_grid.py:13-68)
        from customnerf_tpu.engine.torch_shim import import_reference_checkpoint
        params = import_reference_checkpoint(path, conf_channels=conf_channels)
        meta = {
            "epoch": ckpt.get("epoch", 0),
            "global_step": ckpt.get("global_step", 0),
            "stats": ckpt.get("stats", {}),
        }
        meta.update(occ_meta)
        print(f"[INFO] imported reference-format checkpoint {path}")
        return params, meta
    params = _unflatten({k: np.asarray(v) for k, v in model_sd.items()})
    meta = {
        "epoch": ckpt.get("epoch", 0),
        "global_step": ckpt.get("global_step", 0),
        "stats": ckpt.get("stats", {}),
    }
    meta.update(occ_meta)
    if "optimizer" in ckpt and opt_state_template is not None:
        try:
            treedef = pickle.loads(ckpt["optimizer"]["treedef"])
            leaves = [jnp.asarray(l) for l in ckpt["optimizer"]["leaves"]]
            meta["opt_state"] = jax.tree_util.tree_unflatten(treedef, leaves)
        except Exception as e:  # mismatched optimizer config → warn, keep fresh
            print(f"[WARN] failed to restore optimizer state: {e}")
    return params, meta


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Lexicographically last .pth/.orbax (reference utils_init_nerf.py:837-845)."""
    cands = sorted(glob.glob(os.path.join(ckpt_dir, "*.pth"))
                   + glob.glob(os.path.join(ckpt_dir, "*.orbax")))
    return cands[-1] if cands else None


def prune_ring(stats: dict, ckpt_dir: str, max_keep: int = 5):
    """Ring-buffer pruning sparing *0.* (utils_init_nerf.py:806-815)."""
    while len(stats.get("checkpoints", [])) > max_keep:
        old = os.path.join(ckpt_dir, stats["checkpoints"].pop(0))
        stem = old[:-len(".orbax")] if old.endswith(".orbax") else old[:-len(".pth")]
        if stem.endswith("0"):
            continue
        if os.path.isdir(old):
            import shutil
            shutil.rmtree(old)
        elif os.path.exists(old):
            os.remove(old)


# ----------------------------------------------------------------- orbax
class OrbaxSaver:
    """Optional Orbax-backed ASYNC checkpointing (``--ckpt_format orbax``).

    Keeps the reference's directory discipline (``df_ep%04d.orbax`` dirs
    under ``{workspace}/checkpoints``, same ring policy) but saves the whole
    state pytree asynchronously off the training thread — the TPU keeps
    stepping while the previous checkpoint flushes.  The default ``.pth``
    contract (reference parity) remains untouched.
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, path: str, params, epoch: int, global_step: int,
             stats: dict, opt_state=None, extra: Optional[dict] = None):
        state = {
            "meta": {
                "epoch": epoch,
                "global_step": global_step,
                "stats_pickle": np.frombuffer(pickle.dumps(stats),
                                              dtype=np.uint8),
            },
            "model": _to_builtin(params),
        }
        if opt_state is not None:
            leaves, treedef = jax.tree_util.tree_flatten(opt_state)
            state["optimizer"] = {
                "leaves": {str(i): l for i, l in enumerate(leaves)},
                "treedef": np.frombuffer(pickle.dumps(treedef),
                                         dtype=np.uint8),
            }
        if extra:
            state["meta"].update(extra)
        path = os.path.abspath(path)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._ckptr.save(path, args=self._ocp.args.PyTreeSave(state))
        return path

    def wait(self):
        self._ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, opt_state_template=None):
    """Counterpart loader; returns (params_tree, meta) like load_checkpoint."""
    import orbax.checkpoint as ocp
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    state = ckptr.restore(os.path.abspath(path))
    meta_raw = state.get("meta", {})
    meta = {
        "epoch": int(meta_raw.get("epoch", 0)),
        "global_step": int(meta_raw.get("global_step", 0)),
        "stats": pickle.loads(bytes(np.asarray(
            meta_raw["stats_pickle"], dtype=np.uint8)))
        if "stats_pickle" in meta_raw else {},
    }
    for k in _OCC_ARRAY_KEYS + _OCC_SCALAR_KEYS:
        if k in meta_raw:
            meta[k] = meta_raw[k]
    if "optimizer" in state and opt_state_template is not None:
        try:
            treedef = pickle.loads(bytes(np.asarray(
                state["optimizer"]["treedef"], dtype=np.uint8)))
            leaves_d = state["optimizer"]["leaves"]
            leaves = [jnp.asarray(leaves_d[str(i)])
                      for i in range(len(leaves_d))]
            meta["opt_state"] = jax.tree_util.tree_unflatten(treedef, leaves)
        except Exception as e:
            print(f"[WARN] failed to restore orbax optimizer state: {e}")
    return state["model"], meta
