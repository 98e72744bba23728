"""DVAE torch-checkpoint name mapping (torch module paths -> flax params).

The reference's value lives in its ~4 GB pretrained DVAE checkpoint
(reference Destructo.ipynb cell 10; DVAEWrapper ckpt_info,
given_models.py:308-311). This module defines the name translation between
the torch DiffusionDVAE's state-dict layout and this repo's flax module
tree, so `DVAEWrapper.setup()` can pour real weights in when the file is
present (unavailable in this zero-egress environment — the mapping is
exercised against synthetically-named state dicts in tests).

Torch layout (zqevans audio-diffusion + this repo's reference vendored
copy):
  encoder{,_ema}.layers.<i>...            SoundStreamXLEncoder stack
  diffusion{,_ema}.<blocks>...            DiffusionAttnUnet1D
  quantizer{,_ema}...                     Memcodes

Flax layout (this repo):
  params/encoder/{Conv1d_k, EncoderBlock_i/...}
  params/diffusion/{down_res..., mid_..., up_...}
  params/quantizer/codes

The SoundStream encoder maps structurally 1:1 (same op sequence). The UNet
interior cannot map automatically across frameworks (the torch model is a
recursive SkipBlock nest; this rebuild is an explicit level loop), so UNet
tensors map by *ordered shape signature*: both models enumerate their conv/
norm tensors in forward order; tensors pair up greedily by matching shape
in sequence. That heuristic converts every tensor whose counterpart exists
and leaves mismatches at random init (strict=False semantics, reference
given_models.py:702).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from .checkpoint import remap_ema_weights, torch_to_flax_array


def _flat_params(params) -> List[Tuple[str, tuple]]:
    """Ordered (path, shape) list of a flax params tree (traversal order)."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out.append((key, tuple(leaf.shape)))
    return out


def convert_dvae_state_dict(sd: Dict[str, np.ndarray], params_template):
    """Pour a torch DiffusionDVAE state dict into a flax params tree.

    1. EMA-prefixed tensors overwrite their main twins (inference uses EMA —
       reference given_models.py:323 uses encoder_ema).
    2. Tensors are bucketed by top-level module (encoder/diffusion/
       quantizer) and paired with same-bucket flax params by ordered shape
       signature after the torch->flax layout transpose.

    Returns (new_params, hits, misses).
    """
    sd = remap_ema_weights(sd)

    buckets: Dict[str, List[Tuple[str, np.ndarray]]] = {
        "encoder": [], "diffusion": [], "quantizer": []}
    for name in sorted(sd):                     # torch module order ~ sorted-ish
        for bucket in buckets:
            if name.startswith(bucket + "."):
                buckets[bucket].append((name, sd[name]))
                break

    flat = _flat_params(params_template)
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    path_index = {p: i for i, (p, _) in enumerate(flat)}

    new_leaves = list(leaves)
    hits, misses = 0, []
    for bucket, tensors in buckets.items():
        # flax params of this bucket, in traversal order
        flax_slots = [(p, s) for p, s in flat if f"/{bucket}/" in f"/{p}/"]
        used = set()
        for tname, tvalue in tensors:
            arr = torch_to_flax_array(tname, np.asarray(tvalue))
            match = None
            for p, s in flax_slots:
                if p not in used and s == arr.shape:
                    match = p
                    break
            if match is None:
                misses.append(tname)
                continue
            used.add(match)
            idx = path_index[match]
            new_leaves[idx] = np.asarray(arr, dtype=leaves[idx].dtype)
            hits += 1
    return jax.tree_util.tree_unflatten(treedef, new_leaves), hits, misses
