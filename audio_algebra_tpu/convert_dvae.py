"""DVAE torch-checkpoint name mapping (torch module paths -> flax params).

The reference's value lives in its ~4 GB pretrained DVAE checkpoint
(reference Destructo.ipynb cell 10; DVAEWrapper ckpt_info,
given_models.py:308-311). This module defines the translation between the
torch DiffusionDVAE's state-dict layout and this repo's flax module tree,
so `DVAEWrapper.setup()` can pour real weights in when the file is present
(unavailable in this zero-egress environment — the mapping is exercised
against a vendored torch mirror of the architecture in
tests/test_convert_parity.py, which asserts forward-output parity after
the pour, and against synthetically-named state dicts in tests).

Torch layout (zqevans audio-diffusion + this repo's reference vendored
copy):
  encoder{,_ema}.layers.<i>...            SoundStreamXLEncoder stack
  diffusion{,_ema}.net.<SkipBlock nest>   DiffusionAttnUnet1D
  quantizer{,_ema}...                     Memcodes

Flax layout (this repo):
  params/encoder/{Conv1d_k, EncoderBlock_i/...}
  params/diffusion/{stack_NNN/m0..m5/..., timestep_embed}
  params/quantizer/codes

The flax UNet is block-isomorphic with the torch SkipBlock nest and its
modules are named in forward order, so tensors pair by ordered
(kind, shape) signature inside each bucket — see convert._pour_by_predicate
for the kind rules that make the pairing deterministic (GN scale vs bias,
conv vs norm biases, conv/linear/1x1 orientations).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .checkpoint import remap_ema_weights
from .convert import convert_by_shape, report, _n_params


def convert_dvae_state_dict(sd: Dict[str, np.ndarray], params_template):
    """Pour a torch DiffusionDVAE state dict into a flax params tree.

    1. EMA-prefixed tensors overwrite their main twins (inference uses EMA —
       reference given_models.py:323 uses encoder_ema).
    2. Tensors are bucketed by top-level module (encoder/diffusion/
       quantizer) and paired with same-bucket flax params by ordered
       (kind, shape) signature after the torch->flax layout transpose.

    Returns (new_params, hits, misses).
    """
    sd = remap_ema_weights(sd)
    new, hits, misses = convert_by_shape(
        sd, params_template,
        buckets={"encoder": ("encoder.",),
                 "diffusion": ("diffusion.",),
                 "quantizer": ("quantizer.",)})
    report("DiffusionDVAE", hits, misses, _n_params(params_template))
    return new, hits, misses
