"""Checkpoint/resume with orbax + the reference's tolerant-loading semantics.

Reference keeps best-vs-ckpt copies (train.py:416-424) and four partial
loaders (models.py:431-458); here:
- save_checkpoint/load_checkpoint: orbax round trips of {params, opt_state,
  epoch, score, stats}
- load_whatever: copy matching-name+shape leaves (load_state_dict_whatever)
- load_with_copy: additionally seed 'backup_*' branches from their primary
  counterparts (MCVC-IA warm start, models.py:451-458)
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state: dict, best: bool = False):
    """Writes 'ckpt' (and 'best' when best=True) under directory."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    path = os.path.join(directory, "ckpt")
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckpt.save(path, state)
    ckpt.wait_until_finished()
    if best:
        bpath = os.path.join(directory, "best")
        if os.path.exists(bpath):
            import shutil

            shutil.rmtree(bpath)
        ckpt.save(bpath, state)
        ckpt.wait_until_finished()


def load_checkpoint(directory: str, target: Any, prefer_best: bool = True):
    """Loads 'best' if present else 'ckpt' (reference resume precedence,
    train_multiview.py:137-147)."""
    ckpt = ocp.StandardCheckpointer()
    for name in (("best", "ckpt") if prefer_best else ("ckpt", "best")):
        path = os.path.abspath(os.path.join(directory, name))
        if os.path.exists(path):
            return ckpt.restore(path, target)
    raise FileNotFoundError(f"no checkpoint under {directory}")


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _set_path(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def load_npz_params(path: str, dtype=np.float32) -> dict:
    """Load a flattened assets/*.npz checkpoint (tools/train_tiny.py's
    float16 format: keys are '/'-joined pytree paths) back into a params
    pytree. Returns None when the file does not exist — callers flag the
    random-init fallback."""
    import jax.numpy as jnp

    if not os.path.exists(path):
        return None
    data = np.load(path)
    tree: dict = {}
    for k in data.files:
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k].astype(dtype))
    return tree


def asset_params(name: str, dtype=np.float32) -> dict:
    """load_npz_params for a shipped fastvideocodec_tpu/assets checkpoint
    (e.g. 'hd_lsvctpu_l2')."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_npz_params(
        os.path.join(here, "assets", f"{name}.npz"), dtype=dtype
    )


def load_whatever(params: dict, source: dict) -> dict:
    """Copy every leaf whose path+shape matches (models.py:438-442)."""
    params = jax.tree.map(lambda x: x, params)  # deep copy structure
    flat_src = _flatten(source)
    flat_dst = _flatten(params)
    for path, val in flat_src.items():
        if path in flat_dst and np.shape(flat_dst[path]) == np.shape(val):
            _set_path(params, path, val)
    return params


def load_with_copy(params: dict, source: dict) -> dict:
    """load_whatever + seed backup_* branches from their primaries
    (models.py:451-458)."""
    params = load_whatever(params, source)
    flat = _flatten(params)
    for path, val in list(flat.items()):
        parts = path.split("/")
        for i, p in enumerate(parts):
            if p.startswith("backup_"):
                primary = "/".join(parts[:i] + [p[len("backup_"):]] + parts[i + 1:])
                if primary in flat and np.shape(flat[primary]) == np.shape(val):
                    _set_path(params, path, flat[primary])
                break
    return params
