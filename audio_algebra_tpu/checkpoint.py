"""Checkpointing: orbax save/restore + torch state-dict conversion.

Replaces the reference's three checkpoint mechanisms (SURVEY.md §5):
Lightning ModelCheckpoint/resume -> orbax; manual torch.save -> orbax;
inbound pretrained torch checkpoints -> `load_torch_checkpoint` +
`convert_state_dict` (handles the layout transposes between torch and flax
and the EMA-prefix remapping semantics of the reference's `load_ema_weights`
— reference StackedAELatentDiffusionCond.py:241-255).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ orbax ---

def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree (params/opt state/step) with orbax. Returns the path."""
    import orbax.checkpoint as ocp

    path = Path(os.path.expanduser(path)).resolve()
    if step is not None:
        path = path / f"step_{step:08d}"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return str(path)


def _arraylike(x: Any) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def load_checkpoint(path: str, target: Any = None,
                    sharding: Any = None) -> Any:
    """Restore a pytree saved by save_checkpoint — topology-robustly.

    The restore NEVER relies on the sharding recorded in the checkpoint
    file (orbax's sharding-from-file is unsafe when the device topology
    differs between save and restore — e.g. saved on an 8-chip mesh,
    resumed on 1 chip). Instead:

      * ``sharding=None`` (default): every array leaf restores as host
        numpy; callers place it on their own mesh (the trainers use
        ``parallel.train.replicate_state``).
      * ``sharding=<jax.sharding.Sharding>`` or a pytree of shardings
        matching ``target``: array leaves restore directly as jax.Arrays
        with that EXPLICIT sharding on the current mesh (orbax reshards
        from however many hosts/devices wrote the file).

    Non-array leaves (step counters, schedule scalars) restore as saved.
    """
    import orbax.checkpoint as ocp

    path = Path(os.path.expanduser(path)).resolve()
    ckptr = ocp.PyTreeCheckpointer()

    if target is None:
        # Metadata-driven numpy restore: build explicit RestoreArgs from the
        # checkpoint's own metadata so no file sharding is ever consulted.
        try:
            meta = ckptr.metadata(path)
            # orbax >= 0.11 wraps the per-leaf metadata: StepMetadata ->
            # .item_metadata (TreeMetadata) -> .tree (the actual pytree)
            tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
            restore_args = jax.tree_util.tree_map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray)
                if _arraylike(m) else ocp.RestoreArgs(), tree)
            return ckptr.restore(path, restore_args=restore_args)
        except Exception:
            return ckptr.restore(path)

    if sharding is not None:
        def args_of(leaf, shard):
            if _arraylike(leaf):
                return ocp.ArrayRestoreArgs(sharding=shard,
                                            restore_type=jax.Array)
            return ocp.RestoreArgs()
        if isinstance(sharding, jax.sharding.Sharding):
            restore_args = jax.tree_util.tree_map(
                lambda l: args_of(l, sharding), target)
        else:
            restore_args = jax.tree_util.tree_map(args_of, target, sharding)
        return ckptr.restore(path, item=target, restore_args=restore_args)

    restore_args = jax.tree_util.tree_map(
        lambda l: ocp.RestoreArgs(restore_type=np.ndarray)
        if _arraylike(l) else ocp.RestoreArgs(), target)
    return ckptr.restore(path, item=target, restore_args=restore_args)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest step_XXXXXXXX subdirectory, or None."""
    d = Path(os.path.expanduser(ckpt_dir))
    if not d.exists():
        return None
    steps = sorted(p for p in d.iterdir() if re.match(r"step_\d+", p.name))
    return str(steps[-1]) if steps else None


# ---------------------------------------------------------- torch inbound ---

def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .ckpt/.pt file into a flat {name: np.ndarray} dict.

    Accepts Lightning checkpoints ('state_dict' key), raw state dicts, and
    the DMAE1d format ('model_state_dict' — reference given_models.py:504).
    Uses the baked-in CPU torch only for deserialisation.
    """
    import torch

    obj = torch.load(os.path.expanduser(path), map_location="cpu",
                     weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items() if hasattr(v, "shape")}


def remap_ema_weights(sd: dict) -> dict:
    """The reference's load_ema_weights semantics
    (StackedAELatentDiffusionCond.py:241-255): *_ema.* entries overwrite
    their non-EMA twins; EMA entries are then dropped."""
    out = dict(sd)
    for name, value in sd.items():
        m = re.match(r"(.*?)([a-zA-Z0-9_]+)_ema\.(.*)", name)
        if m:
            out[f"{m.group(1)}{m.group(2)}.{m.group(3)}"] = value
    return {k: v for k, v in out.items() if "_ema." not in k}


def torch_to_flax_array(name: str, value: np.ndarray) -> np.ndarray:
    """Layout transposes: torch Conv1d (out,in,k) -> flax (k,in,out);
    torch Linear (out,in) -> flax kernel (in,out)."""
    if value.ndim == 3:
        return np.transpose(value, (2, 1, 0))
    if value.ndim == 2 and ("weight" in name or "kernel" in name):
        return np.transpose(value, (1, 0))
    return value


def convert_state_dict(sd: dict, name_map: Callable[[str], Optional[str]],
                       params_template: Any) -> Any:
    """Pour a flat torch state dict into a flax params pytree.

    `name_map(torch_name) -> 'path/to/flax/param'` (or None to skip). Any
    template leaf not covered keeps its (random-init) value — mirroring the
    reference's strict=False loads (given_models.py:702).
    """
    flat = jax.tree_util.tree_flatten_with_path(params_template)
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    path_to_idx = {}
    for i, (path, leaf) in enumerate(flat[0]):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        path_to_idx[key] = i

    new_leaves = list(leaves)
    hits = 0
    for tname, tvalue in sd.items():
        fname = name_map(tname)
        if fname is None or fname not in path_to_idx:
            continue
        idx = path_to_idx[fname]
        arr = torch_to_flax_array(tname, tvalue)
        if arr.shape != new_leaves[idx].shape:
            continue  # shape-mismatch: keep random init (strict=False)
        new_leaves[idx] = jnp.asarray(arr, new_leaves[idx].dtype)
        hits += 1
    return jax.tree_util.tree_unflatten(treedef, new_leaves), hits
