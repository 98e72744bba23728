"""Torch-checkpoint -> flax conversion for the whole pretrained zoo.

Round 1 shipped a converter only for the DVAE (convert_dvae.py); the other
wrappers loaded torch state dicts and dropped them. This module generalises
the bucketed ordered-shape-signature approach to every pretrained model the
reference ships weights for:

  * LatentAudioDiffusionAutoencoder  (StackedDiffAEWrapper / CLAPDAE stage-1;
    reference given_models.py:404-422 `load_from_checkpoint` + the EMA swap
    :414-416, StackedAELatentDiffusionCond.py:241-255 `load_ema_weights`)
  * StackedAELatentDiffusionCond     (CLAPDAE generator; reference
    given_models.py:695-707, env CLAPDAE_CKPT_{22s,66s})
  * DMAE1d / DiffusionAE             (reference given_models.py:500-506,
    `model_state_dict`, strict=True)
  * RAVE TorchScript archives        (reference given_models.py:539-544,
    torch.jit.load)
  * laion_clap towers                (reference given_models.py:682-688)

Why shape signatures: the torch models are recursive module nests from
external packages; this rebuild re-architects them as explicit flax level
loops, so name-for-name mapping does not exist. Instead tensors are
bucketed by top-level module, both sides are ordered naturally (numeric-
aware sort ~ module definition order), and tensors pair greedily by shape
after the torch->flax layout transpose. Everything that pairs converts;
everything else keeps random init — the reference's own strict=False
semantics (given_models.py:702). Hit/miss counts are always reported so a
partial pour is visible, never silent.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Iterable, List, Tuple

import jax
import numpy as np

from .checkpoint import remap_ema_weights, torch_to_flax_array


# --------------------------------------------------------------- ordering ---

def _natkey(name: str):
    """Natural sort key: 'layers.10' sorts after 'layers.2'."""
    return [int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", name)]


def _flat_params(params) -> List[Tuple[str, tuple]]:
    """(path, shape) list of a flax params tree, naturally ordered."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out.append((key, tuple(leaf.shape)))
    out.sort(key=lambda ps: _natkey(ps[0]))
    return out


def strip_prefixes(sd: Dict[str, np.ndarray],
                   prefixes: Iterable[str] = ("model.", "module.")) -> Dict[str, np.ndarray]:
    """Drop common wrapper prefixes (Lightning 'model.', DDP 'module.')."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


# ------------------------------------------------------ generic shape pour ---

def convert_by_shape(sd: Dict[str, np.ndarray], params_template,
                     buckets: Dict[str, Tuple[str, ...]],
                     min_ndim: int = 1):
    """Pour a flat torch state dict into a flax params tree.

    buckets: {flax_path_token: (torch_name_prefixes...)}. A torch tensor
    goes to the first bucket whose prefix matches; a flax param belongs to
    a bucket when the token appears as a path component. Within a bucket,
    both sides are naturally ordered and pair greedily by post-transpose
    shape. Returns (new_params, hits, misses: list of unmatched torch
    names).
    """
    pairs = []
    claimed: List[str] = []
    for b, prefixes in buckets.items():
        def torch_pred(n, prefixes=prefixes, prior=tuple(claimed)):
            return any(n.startswith(p) for p in prefixes) and \
                not any(n.startswith(p) for p in prior)
        pairs.append((lambda p, b=b: b in p.split("/"), torch_pred))
        claimed.extend(prefixes)
    return _pour_by_predicate(sd, params_template, pairs)


def report(name: str, hits: int, misses: List[str], total_slots: int) -> None:
    """Always-visible conversion summary (no silent partial loads)."""
    print(f"{name}: converted {hits} tensors "
          f"({len(misses)} unmatched torch tensors, "
          f"{max(total_slots - hits, 0)} flax params left at init)")
    if hits == 0 and misses:
        print(f"{name}: WARNING — checkpoint loaded but NO tensors matched; "
              "weights were NOT applied (model runs with random init)")


def _n_params(tree) -> int:
    return len(jax.tree_util.tree_leaves(tree))


# ----------------------------------------------------------- per-model API ---

def convert_stacked_state_dict(sd: Dict[str, np.ndarray], params_template):
    """LatentAudioDiffusionAutoencoder checkpoints (Lightning state dict with
    autoencoder./latent_encoder./diffusion. + *_ema twins). EMA tensors
    overwrite the mains first — the reference's setup swap
    (given_models.py:414-416)."""
    sd = remap_ema_weights(strip_prefixes(sd))
    new, hits, misses = convert_by_shape(
        sd, params_template,
        buckets={"autoencoder": ("autoencoder.",),
                 "latent_encoder": ("latent_encoder.",),
                 "diffusion": ("diffusion.",)})
    report("LatentAudioDiffusionAutoencoder", hits, misses,
           _n_params(params_template))
    return new, hits, misses


def convert_ldm_state_dict(sd: Dict[str, np.ndarray], params_template):
    """StackedAELatentDiffusionCond checkpoints. The torch module holds
    `diffusion` (UNetCFG1d) plus `diffusion_ema` (ema_pytorch EMA whose
    online/ema copies live under .online_model./.ema_model.); inference
    wants the EMA copy (reference given_models.py:646 uses diffusion_ema)."""
    sd = strip_prefixes(sd)
    # prefer the EMA copy: ema_pytorch layout first, plain *_ema second
    remapped = dict(sd)
    for k, v in sd.items():
        m = re.match(r"diffusion_ema\.ema_model\.(.*)", k)
        if m:
            remapped[f"diffusion.{m.group(1)}"] = v
    remapped = {k: v for k, v in remapped.items()
                if ".online_model." not in k and "diffusion_ema" not in k
                or re.match(r"diffusion_ema\.ema_model\.", k)}
    remapped = remap_ema_weights(remapped)
    new, hits, misses = convert_by_shape(
        remapped, params_template,
        buckets={"diffusion": ("diffusion.",)})
    report("StackedAELatentDiffusionCond", hits, misses,
           _n_params(params_template))
    return new, hits, misses


def convert_dmae_state_dict(sd: Dict[str, np.ndarray], params_template):
    """DMAE1d `model_state_dict` (reference given_models.py:504). The torch
    DiffusionAE nests an encoder (MelE1d) and a UNetV0; this rebuild's
    DiffusionAE1d has {encoder, unet}. Torch tensors bucket by whether
    'encoder' appears in their path; shapes pour where the re-architected
    towers align (partial by design — the reconstruction is a capability
    rebuild, not a clone; unmatched tensors are reported)."""
    sd = strip_prefixes(sd)
    enc_names = tuple(
        {n.split(".")[0] + "." for n in sd if "encoder" in n.split(".")[0]}
    ) or ("encoder.",)
    other = tuple({n.split(".")[0] + "." for n in sd
                   if n.split(".")[0] + "." not in enc_names})
    new, hits, misses = convert_by_shape(
        sd, params_template,
        buckets={"encoder": enc_names, "unet": other})
    report("DMAE1d", hits, misses, _n_params(params_template))
    return new, hits, misses


def _pour_by_predicate(sd: Dict[str, np.ndarray], params_template,
                       pairs: List[Tuple]) -> Tuple:
    """Shared pour loop: pairs = [(slot_pred(path)->bool,
    torch_pred(name)->bool), ...]; each pair is an independently-ordered
    bucket. Returns (new_params, hits, misses)."""
    flat = _flat_params(params_template)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params_template)[0]
    flat_leaves, treedef = jax.tree_util.tree_flatten(params_template)
    path_index = {}
    for i, (path, _) in enumerate(leaves_with_path):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        path_index[key] = i
    new_leaves = list(flat_leaves)
    hits, misses = 0, []
    for slot_pred, torch_pred in pairs:
        slots = [(p, s) for p, s in flat if slot_pred(p)]
        used = set()
        for tname in sorted(sd, key=_natkey):
            if not torch_pred(tname):
                continue
            arr = np.asarray(sd[tname])
            if arr.ndim < 1:
                continue
            arr = torch_to_flax_array(tname, arr)
            match = next((p for p, s in slots
                          if p not in used and s == arr.shape), None)
            if match is None:
                misses.append(tname)
                continue
            used.add(match)
            idx = path_index[match]
            new_leaves[idx] = np.asarray(arr, dtype=flat_leaves[idx].dtype)
            hits += 1
    return jax.tree_util.tree_unflatten(treedef, new_leaves), hits, misses


def convert_rave_state_dict(sd: Dict[str, np.ndarray], params_template):
    """RAVE state dict (from a .ckpt or a TorchScript archive's
    state_dict()). Buckets: encoder.* -> enc_* params, decoder.* -> dec_*
    (IRCAM RAVE names its halves `encoder`/`decoder`)."""
    sd = strip_prefixes(sd, ("model.", "module.", "_rave.", "pretrained."))
    new, hits, misses = _pour_by_predicate(
        sd, params_template,
        [(lambda p: p.split("/")[1].startswith("enc"),
          lambda n: n.startswith("encoder.")),
         (lambda p: p.split("/")[1].startswith("dec"),
          lambda n: n.startswith("decoder."))])
    report("RAVE", hits, misses, _n_params(params_template))
    return new, hits, misses


def load_torchscript_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a TorchScript archive (.ts) and extract its state dict
    (reference given_models.py:539-544 loads RAVE .ts exports via
    torch.jit.load; the in-image CPU torch deserialises them fine)."""
    import torch

    mod = torch.jit.load(os.path.expanduser(path), map_location="cpu")
    return {k: v.detach().cpu().numpy()
            for k, v in mod.state_dict().items()}


def convert_clap_state_dict(sd: Dict[str, np.ndarray], audio_template,
                            text_template):
    """laion_clap checkpoints: audio tower tensors live under
    audio_branch./audio_projection., text under text_branch./
    text_projection. (reference given_models.py:682-688 load_ckpt;
    laion_clap projections are Sequential(Linear, ReLU, Linear) -> indices
    0 and 2). The projection MLPs map explicitly (proj1/proj2 and proj);
    front-end + transformer tensors pour by shape where the widths align.
    The Swin-windowed HTSAT interior mostly cannot map onto the
    full-attention rebuild and is reported as unmatched — the documented
    stand-in limit."""
    sd = strip_prefixes(sd, ("model.", "module.", "clap_model."))
    # HTSAT's mel front-end is a Conv2d(1 -> width, 4x4 patches); the
    # rebuild's patch embed is a Dense over the flattened 4x4 patch, so the
    # conv kernel reshapes onto it exactly: (W, 1, 4, 4) -> (16, W)
    sd = dict(sd)
    for k in list(sd):
        if k.endswith("patch_embed.proj.weight") and np.asarray(sd[k]).ndim == 4:
            w4 = np.asarray(sd[k])                     # (W, 1, kh, kw)
            sd[k] = w4.reshape(w4.shape[0], -1)        # (W, 16) -> transposed
    new_audio, ha, ma = _pour_by_predicate(
        sd, audio_template,
        [(lambda p: "/proj1/" in p, lambda n: n.startswith("audio_projection.0")),
         (lambda p: "/proj2/" in p, lambda n: n.startswith("audio_projection.2")),
         (lambda p: "patch_embed" in p,
          lambda n: n.startswith("audio_branch.") and "patch_embed" in n),
         (lambda p: "/block" in p or "/pos_embed" in p or "LayerNorm" in p,
          lambda n: n.startswith("audio_branch.") and "patch_embed" not in n)])
    new_text, ht, mt = _pour_by_predicate(
        sd, text_template,
        [(lambda p: "/proj/" in p, lambda n: n.startswith("text_projection.2")),
         (lambda p: "/block" in p or "embed" in p or "LayerNorm" in p,
          lambda n: n.startswith("text_branch."))])
    report("CLAP audio tower", ha, ma, _n_params(audio_template))
    report("CLAP text tower", ht, mt, _n_params(text_template))
    return new_audio, new_text, ha + ht, ma + mt
