"""given_models — uniform wrappers over the frozen pretrained model zoo.

Rebuild of the reference's central public API (reference
audio_algebra/given_models.py): an abstract `GivenModelClass` with
encode/decode/forward/setup/get_checkpoint/match_sizes (given_models.py:
58-145) and nine concrete wrappers. Same class names, same call surface;
the compute path is jitted JAX instead of torch modules:

  * every wrapper owns flax module(s) + parameter pytrees and caches one
    jitted program per (function, shape) — repeated encode/decode calls hit
    the XLA executable cache;
  * EMA weights are separate param trees (the reference deep-copies torch
    modules);
  * `setup()` loads/converts checkpoints when available and falls back to
    random weights exactly like the reference ("Going with random weights",
    given_models.py:354).
"""
from __future__ import annotations

import hashlib
import math
import os
import subprocess
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.stft import spectrogram, inverse_spectrogram, griffin_lim
from .ops.mel import melspectrogram, inverse_mel_scale
from .ops.resample import resample
from .ops.phase import mag_dphase_encode, mag_dphase_decode
from .models.dvae import DiffusionDVAE
from .models.stacked import LatentAudioDiffusionAutoencoder, StackedAELatentDiffusionCond
from .models.clap import CLAPModule
from .utils.params import fast_random_params
from .utils.prng import host_cast, host_normal
from .samplers.vddim import sample as vddim_sample, resample_diffusion
from .samplers.kdiff import kdiff_sample

__all__ = ['GivenModelClass', 'SpectrogramAE', 'MagSpectrogramAE',
           'MagDPhaseSpectrogramAE', 'MelSpectrogramAE', 'DVAEWrapper',
           'StackedDiffAEWrapper', 'DMAE1d', 'RAVEWrapper', 'CLAPDAE']


class GivenModelClass:
    """Shorthand base for the given models (reference given_models.py:58-145)."""

    def __init__(self,
                 zero_pad: bool = True,
                 make_sizes_match: bool = True,
                 ckpt_info: Optional[dict] = None,
                 seed: int = 0,
                 **kwargs):
        self.make_sizes_match = make_sizes_match
        self.orig_shape = None
        self.zero_pad = zero_pad
        self.ckpt_info = ckpt_info or {'ckpt_path': '', 'ckpt_url': '',
                                       'ckpt_hash': '', 'gdrive_path': ''}
        self.name = self.__class__.__name__
        self.ckpt_dir = os.path.expanduser('~/checkpoints')
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.debug = False
        from .utils.prng import host_key
        self._key = host_key(seed)
        self._jit_cache: dict = {}

    # -- PRNG plumbing (replaces torch global RNG state) --
    def next_key(self):
        # host-side split (utils/prng.py): an eager on-relay key op costs
        # minutes on axon; the CPU-backend threefry is bit-identical
        from .utils.prng import host_split
        self._key, sub = host_split(self._key)
        return sub

    def _cached_jit(self, name: str, fn):
        # key on the trace-time env flags too: the int8 path and the
        # grouped-GN fold are chosen at trace time, so flipping
        # AA_TURBO_INT8 / AA_LDM_GN mid-process must not reuse stale
        # programs
        from .models.blocks import turbo_int8
        name = (f"{name}|turbo={turbo_int8()}"
                f"{os.environ.get('AA_TURBO_MIN_B', '16')}"
                f"|ldmgn={os.environ.get('AA_LDM_GN', '0')}"
                f"{os.environ.get('AA_LDM_GN_PALLAS', '0')}"
                f"|fold={os.environ.get('AA_SEQFOLD', '1')}"
                f"{os.environ.get('AA_SEQFOLD_MAX_B', '2')}"
                f"|rh={os.environ.get('AA_RELPOS_HOIST', '1')}"
                f"|if={os.environ.get('AA_INNER_FOLD', '1')}")
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # -- reference API surface --
    def setup(self, gdrive: bool = True):
        """Setup can include things such as downloading checkpoints."""
        pass

    def encode(self, waveform, **kwargs):
        return None

    def decode(self, reps, **kwargs):
        return None

    def forward(self, waveform):
        """encode then decode; returns (reps, recons) (reference :78-82)."""
        reps = self.encode(waveform)
        recons = self.decode(reps)
        return (reps, recons)

    def __call__(self, *args, **kwargs):
        """torch nn.Module semantics: calling the wrapper dispatches to the
        (possibly subclass-overridden) forward — `__call__ = forward` in the
        class body would freeze the BASE forward and silently bypass
        DMAE1d/CLAPDAE overrides."""
        return self.forward(*args, **kwargs)

    def get_checkpoint(self, gdrive: bool = True):
        """Ensure the checkpoint file exists locally (reference :84-121).

        Downloads by URL when one is configured and the environment has
        network access; verifies SHA-256 when a hash is given. Zero-egress
        environments simply leave the path missing and setup() falls back
        to random weights.
        """
        info = self.ckpt_info
        if not info or all(v == '' for v in info.values()):
            print("No checkpoint info available.")
            return
        ckpt_file = os.path.expanduser(info.get('ckpt_path', ''))
        if ckpt_file and os.path.exists(ckpt_file):
            print("Checkpoint found!")
            if info.get('ckpt_hash'):
                digest = hashlib.sha256(Path(ckpt_file).read_bytes()).hexdigest()
                if digest != info['ckpt_hash']:
                    # explicit raise, not assert: `python -O` strips asserts
                    # and a tampered checkpoint must never load silently
                    raise RuntimeError("Hashes don't match. STOP. DO NOT EXECUTE.")
                print("Checkpoint hash checks out.")
            return
        url = info.get('ckpt_url', '')
        if url and ckpt_file:
            print(f"Downloading to {ckpt_file}")
            try:
                # argv list, not a shell string: ckpt_info values can come
                # from config/CLI and must not reach a shell. --fail keeps
                # HTTP error/HTML pages from being saved as the checkpoint.
                subprocess.run(
                    ["curl", "-L", "--fail", "--connect-timeout", "5",
                     "--max-time", "300", url, "-o", ckpt_file],
                    check=True, timeout=330)
                if info.get('ckpt_hash'):
                    digest = hashlib.sha256(
                        Path(ckpt_file).read_bytes()).hexdigest()
                    if digest != info['ckpt_hash']:
                        os.remove(ckpt_file)
                        print("Downloaded file failed its SHA-256 check; "
                              "removed. Continuing without checkpoint")
            except Exception as e:
                print(f"Download failed ({e}); continuing without checkpoint")

    def match_sizes(self, recon):
        """Match recon length to the original waveform (reference :123-133)."""
        if self.make_sizes_match and self.orig_shape is not None \
                and tuple(recon.shape) != tuple(self.orig_shape):
            target = self.orig_shape[-1]
            if recon.shape[-1] > target:
                recon = recon[..., :target]
            else:
                pad = target - recon.shape[-1]
                recon = jnp.pad(jnp.asarray(recon),
                                [(0, 0)] * (recon.ndim - 1) + [(0, pad)])
            assert recon.shape[-1] == target
        return recon

    # -- fourier helpers (reference :136-145) --
    @staticmethod
    def next_power_of_2(x: int) -> int:
        return 1 if x == 0 else 2 ** (x - 1).bit_length()

    def zero_pad_po2(self, x):
        x = jnp.asarray(x)
        new_len = self.next_power_of_2(x.shape[-1])
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, new_len - x.shape[-1])])


# --------------------------------------------------------------------------
class SpectrogramAE(GivenModelClass):
    """Raw (complex) spectrogram AE — perfect reconstruction
    (reference given_models.py:149-168)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 center: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.n_fft, self.hop_length, self.center = n_fft, hop_length, center

    def encode(self, waveform, **kwargs):
        waveform = jnp.asarray(waveform)
        self.orig_shape = waveform.shape
        x = self.zero_pad_po2(waveform) if self.zero_pad else waveform
        fn = self._cached_jit(
            f"enc{x.shape}", lambda a: spectrogram(
                a, self.n_fft, self.hop_length, power=None, center=self.center))
        return fn(x)

    def decode(self, reps, **kwargs):
        fn = self._cached_jit(
            f"dec{reps.shape}", lambda s: inverse_spectrogram(
                s, self.n_fft, self.hop_length, center=self.center))
        return self.match_sizes(fn(reps))


class MagSpectrogramAE(GivenModelClass):
    """Power spectrogram encoder + GriffinLim decoder
    (reference given_models.py:171-189)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 center: bool = True, n_iter: int = 32, **kwargs):
        super().__init__(**kwargs)
        self.n_fft, self.hop_length, self.center, self.n_iter = \
            n_fft, hop_length, center, n_iter

    def encode(self, waveform, **kwargs):
        waveform = jnp.asarray(waveform)
        self.orig_shape = waveform.shape
        x = self.zero_pad_po2(waveform) if self.zero_pad else waveform
        fn = self._cached_jit(
            f"enc{x.shape}", lambda a: spectrogram(
                a, self.n_fft, self.hop_length, power=2, center=self.center))
        return fn(x)

    def decode(self, reps, **kwargs):
        key = self.next_key()
        fn = self._cached_jit(
            f"dec{reps.shape}", lambda s, k: griffin_lim(
                s, self.n_fft, self.hop_length, power=2.0,
                n_iter=self.n_iter, key=k))
        return self.match_sizes(fn(reps, key))


class MagDPhaseSpectrogramAE(GivenModelClass):
    """Magnitude + phase-difference encoding with exact decoder
    (reference given_models.py:192-254; the Python phase-integration loop
    at :247-249 is a cumsum here — see ops/phase.py)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 center: bool = True, init: str = 'true', use_cos: bool = False,
                 debug: bool = False, cheat: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.n_fft, self.hop_length, self.center = n_fft, hop_length, center
        self.init, self.use_cos, self.debug, self.cheat = init, use_cos, debug, cheat
        self.pi = math.pi
        self.theta = None

    def encode(self, waveform, **kwargs):
        waveform = jnp.asarray(waveform)
        self.orig_shape = waveform.shape
        x = self.zero_pad_po2(waveform) if self.zero_pad else waveform
        spec = spectrogram(x, self.n_fft, self.hop_length, power=None,
                           center=self.center)
        if self.cheat:
            self.spec_orig = spec
            self.mag_orig = jnp.abs(spec)
            self.theta = jnp.angle(spec)
        return mag_dphase_encode(spec, use_cos=self.use_cos)

    def decode(self, reps, **kwargs):
        if self.cheat and self.theta is not None:
            nc = reps.shape[-3] // 2
            mag = reps[..., :nc, :, :]
            spec = jax.lax.complex(mag * jnp.cos(self.theta),
                                   mag * jnp.sin(self.theta))
        else:
            spec = mag_dphase_decode(reps, init=self.init,
                                     key=self.next_key() if self.init == 'rand' else None)
        if self.debug:
            self.spec_new, self.mag_new = spec, jnp.abs(spec)
        out = inverse_spectrogram(spec, self.n_fft, self.hop_length,
                                  center=self.center)
        return self.match_sizes(out)


class MelSpectrogramAE(GivenModelClass):
    """Mel encoder; InverseMelScale + GriffinLim decoder
    (reference given_models.py:257-283)."""

    def __init__(self, sample_rate: int = 48000, n_fft: int = 1024,
                 hop_length: int = 256, center: bool = True,
                 n_mels: int = 128, n_iter: int = 32, **kwargs):
        super().__init__(**kwargs)
        self.sample_rate, self.n_fft, self.hop_length = sample_rate, n_fft, hop_length
        self.center, self.n_mels, self.n_iter = center, n_mels, n_iter

    def encode(self, waveform, **kwargs):
        waveform = jnp.asarray(waveform)
        self.orig_shape = waveform.shape
        x = self.zero_pad_po2(waveform) if self.zero_pad else waveform
        fn = self._cached_jit(
            f"enc{x.shape}", lambda a: melspectrogram(
                a, self.sample_rate, self.n_fft, self.hop_length,
                n_mels=self.n_mels, center=self.center))
        return fn(x)

    def decode(self, melspec, **kwargs):
        key = self.next_key()
        fn = self._cached_jit(
            f"dec{melspec.shape}",
            lambda m, k: griffin_lim(
                inverse_mel_scale(m, self.n_fft // 2 + 1, self.sample_rate,
                                  self.n_mels),
                self.n_fft, self.hop_length, power=2.0, n_iter=self.n_iter, key=k))
        return self.match_sizes(fn(melspec, key))


# --------------------------------------------------------------------------
class DVAEWrapper(GivenModelClass):
    """Wrapper for the DiffusionDVAE (reference given_models.py:286-358).

    encode: pqmf -> EMA encoder -> optional quantize -> tanh (+ stores the
    decode noise like the reference, :320). decode: v-DDIM `sample` over the
    stored noise conditioned on reps, then 'b d n -> d (b n)' flatten.
    """

    DEFAULT_ARGS = {'num_quantizers': 0, 'sample_size': 65536, 'demo_steps': 50,
                    'sample_rate': 48000, 'latent_dim': 64, 'pqmf_bands': 1,
                    'ema_decay': 0.995}

    def __init__(self, args_dict: Optional[dict] = None, debug: bool = True,
                 model_kwargs: Optional[dict] = None, **kwargs):
        super().__init__(**kwargs)
        args = dict(self.DEFAULT_ARGS)
        args.update(args_dict or {})
        self.global_args = args
        self.debug = debug
        self.model = DiffusionDVAE(
            latent_dim=args['latent_dim'], pqmf_bands=args['pqmf_bands'],
            num_quantizers=args['num_quantizers'], **(model_kwargs or {}))
        self.params = None          # main weights
        self.params_ema = None      # EMA weights (used for inference)
        self.noise = None
        self.demo_steps = args['demo_steps']
        self.demo_samples = args['sample_size']
        self.ckpt_info = {
            'ckpt_url': 'https://drive.google.com/file/d/1C3NMdQlmOcArGt1KL7pH32KtXVCOfXKr/view?usp=sharing',
            'ckpt_hash': '6a304c3e89ea3f7ca023f4c9accc5df8de0504595db41961cc7e8b0d07876ef5',
            'gdrive_path': 'MyDrive/AI/checkpoints/DiffusionDVAE.ckpt',
            'ckpt_path': '~/checkpoints/dvae_checkpoint.ckpt'}

    def _ensure_params(self, example_len: Optional[int] = None):
        if self.params is None:
            length = example_len or self.global_args['sample_size']
            x = jnp.zeros((1, 2, length))
            # eval_shape init: flax init would execute the full forward
            self.params = fast_random_params(self.model, self.next_key(), x,
                                             jnp.zeros((1,)))
            self.params_ema = self.params  # EMA starts as a copy

    def encode(self, waveform):
        waveform = jnp.asarray(waveform)
        self.orig_shape = waveform.shape
        self.demo_samples = waveform.shape[-1]
        self._ensure_params(waveform.shape[-1])
        fn = self._cached_jit(
            "encode_it", lambda p, x: self.model.apply(
                p, x, method=DiffusionDVAE.encode_it))
        reps = fn(self.params_ema, waveform)
        self.noise = host_normal(
            self.next_key(), (waveform.shape[0], 2, self.demo_samples))
        return reps

    def decode(self, reps, demo_steps: Optional[int] = None):
        if demo_steps is None:
            demo_steps = self.demo_steps
        self._ensure_params()
        noise = self.noise
        if noise is None or noise.shape[0] != reps.shape[0]:
            noise = host_normal(
                self.next_key(), (reps.shape[0], 2, self.demo_samples))

        def decode_fn(p, n, r):
            from .models.blocks import turbo_int8
            if turbo_int8():
                # amax-carry: the UNet quantises each intra-level hop on
                # the PREVIOUS step's amax grid, so the sampler threads
                # the aux tree through the scan (quantize_act passes gone)
                model_fn = lambda x, t, aux, cond: self.model.apply(
                    p, x, t, cond, q_aux=aux,
                    method=DiffusionDVAE.decode_v_aux)
                return vddim_sample(model_fn, n, demo_steps, 0, r,
                                    aux_mode=True)
            from .parallel.fold import decode_unet_seqfold, seqfold_ok
            if seqfold_ok(n.shape[0]):
                # small-batch serving: fold time blocks into batch (the
                # B<=2 conv MXU cliff, docs/performance.md "Serving B=1")
                m = self.model
                cfg = dict(io_channels=m.io_channels, cond_dim=m.latent_dim,
                           n_attn_layers=m.n_attn_layers,
                           c_mults=tuple(m.diffusion_c_mults),
                           pqmf_bands=m.pqmf_bands)
                model_fn = lambda x, t, cond: decode_unet_seqfold(
                    p["params"]["diffusion"], x, t, cond, **cfg)
                return vddim_sample(model_fn, n, demo_steps, 0, r)
            model_fn = lambda x, t, cond: self.model.apply(
                p, x, t, cond, method=DiffusionDVAE.decode_v)
            return vddim_sample(model_fn, n, demo_steps, 0, r)

        fn = self._cached_jit(f"decode{demo_steps}_{reps.shape}", decode_fn)
        fakes = fn(self.params_ema, noise, reps)
        b, d, n = fakes.shape                         # 'b d n -> d (b n)'
        return jnp.swapaxes(fakes, 0, 1).reshape(d, b * n)

    def decode_seqpar(self, reps, mesh, axis: str = "seq",
                      demo_steps: Optional[int] = None,
                      sharded_levels: Optional[int] = None):
        """decode() with the diffusion UNet SEQUENCE-PARALLEL over
        mesh[`axis`] (parallel/infer.py): one oversized window decodes
        across chips instead of being chunked+crossfaded, with only conv
        halos and GroupNorm statistics crossing ICI. Same sampler, same
        crash schedule, same stored noise — numerically matches decode()
        to float tolerance (tests/test_seqpar_unet.py). bf16/f32 only
        (turbo int8 targets the single-chip batch-serving case)."""
        from .parallel.infer import decode_unet_seqpar
        if demo_steps is None:
            demo_steps = self.demo_steps
        self._ensure_params()
        noise = self.noise
        if noise is None or noise.shape[0] != reps.shape[0]:
            noise = host_normal(
                self.next_key(), (reps.shape[0], 2, self.demo_samples))
        m = self.model
        cfg = dict(io_channels=m.io_channels, cond_dim=m.latent_dim,
                   n_attn_layers=m.n_attn_layers,
                   c_mults=tuple(m.diffusion_c_mults),
                   pqmf_bands=m.pqmf_bands)

        def decode_fn(p, n, r):
            model_fn = lambda x, t, cond: decode_unet_seqpar(
                p["params"]["diffusion"], x, t, cond, mesh=mesh, axis=axis,
                sharded_levels=sharded_levels, **cfg)
            return vddim_sample(model_fn, n, demo_steps, 0, r)

        # key carries sharded_levels + the mesh's device identity: a later
        # call with a different level split or a same-shaped mesh over
        # DIFFERENT devices must not reuse the first compiled closure
        mesh_id = tuple(d.id for d in mesh.devices.flat)
        fn = self._cached_jit(
            f"decode_seqpar{demo_steps}_{reps.shape}_{axis}{mesh.shape[axis]}"
            f"_lv{sharded_levels}_m{mesh_id}",
            decode_fn)
        fakes = fn(self.params_ema, noise, reps)
        b, d, n = fakes.shape                         # 'b d n -> d (b n)'
        return jnp.swapaxes(fakes, 0, 1).reshape(d, b * n)

    def setup(self, gdrive: bool = True):
        ckpt_file = os.path.expanduser(self.ckpt_info['ckpt_path'])
        print(f"DVAE: attempting to load checkpoint {ckpt_file}")
        self.get_checkpoint(gdrive=gdrive)
        self._ensure_params()
        try:
            from .checkpoint import load_torch_checkpoint
            from .convert_dvae import convert_dvae_state_dict

            sd = load_torch_checkpoint(ckpt_file)
            converted, hits, misses = convert_dvae_state_dict(sd, self.params)
            self.params = jax.tree_util.tree_map(jnp.asarray, converted)
            self.params_ema = self.params
            print(f"DVAE: converted torch checkpoint — {hits} tensors mapped, "
                  f"{len(misses)} unmapped (kept random)")
        except Exception as e:
            print(f"Sorry, exception = {e}. Going with random weights")


class StackedDiffAEWrapper(GivenModelClass):
    """Wrapper for the 2-stage LatentAudioDiffusionAutoencoder
    (reference given_models.py:361-422) with the stage-wise hooks
    decode_stage1to2 / decode_stage2 (:392-402)."""

    def __init__(self, debug: bool = True, first_stage_config: Optional[dict] = None,
                 ckpt_info: Optional[dict] = None, model_kwargs: Optional[dict] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.debug = debug
        self.first_stage_config = first_stage_config or \
            {"capacity": 64, "c_mults": [2, 4, 8, 16, 32],
             "strides": [2, 2, 2, 2, 2], "latent_dim": 32}
        fsc = self.first_stage_config
        self.model = LatentAudioDiffusionAutoencoder(
            latent_dim=fsc["latent_dim"], ae_capacity=fsc["capacity"],
            ae_c_mults=tuple(fsc["c_mults"]), ae_strides=tuple(fsc["strides"]),
            **(model_kwargs or {}))
        self.latent_dim = self.model.latent_dim
        self.latent_downsampling_ratio = self.model.latent_downsampling_ratio
        self.params = None
        self.ckpt_info = ckpt_info or \
            {'ckpt_path': '~/checkpoints/stacked-diffae-more-310k.ckpt',
             'ckpt_hash': '91f33839ecb6e3c41b1e89e1a9e0de0dac2ebe1795efa034797429c202600a58',
             'ckpt_url': '', 'gdrive_path': ''}

    def _ensure_params(self, example_len: int = 4096):
        if self.params is None:
            x = jnp.zeros((1, 2, example_len))
            self.params = fast_random_params(self.model, self.next_key(), x,
                                             jnp.zeros((1,)))

    def encode(self, reals):
        reals = jnp.asarray(reals)
        self._ensure_params(reals.shape[-1])
        fn = self._cached_jit("encode", lambda p, x: self.model.apply(
            p, x, method=LatentAudioDiffusionAutoencoder.encode))
        return fn(self.params, reals)

    def decode_stage1to2(self, small_reps, steps: int = 100):
        """small (stage-2) reps -> large (stage-1) latents via cond diffusion
        (reference :392-398)."""
        self._ensure_params()
        noise = host_normal(
            self.next_key(),
            (small_reps.shape[0], self.latent_dim,
             small_reps.shape[2] * self.latent_downsampling_ratio))

        def fn(p, n, small):
            from .models.blocks import turbo_int8
            if turbo_int8():
                model_fn = lambda x, t, aux, cond: self.model.apply(
                    p, x, t, cond, q_aux=aux,
                    method=LatentAudioDiffusionAutoencoder.diffusion_v_aux)
                return vddim_sample(model_fn, n, steps, 0, small,
                                    aux_mode=True)
            model_fn = lambda x, t, cond: self.model.apply(
                p, x, t, cond, method=LatentAudioDiffusionAutoencoder.diffusion_v)
            return vddim_sample(model_fn, n, steps, 0, small)

        return self._cached_jit(f"s1to2_{steps}_{small_reps.shape}", fn)(
            self.params, noise, small_reps)

    def decode_stage2(self, first_stage_sampled, steps: int = 100):
        """large reps -> audio (reference :400-402).

        `steps` is accepted for signature parity with the reference's
        `decode_stage2(first_stage_sampled, steps=100)` and is UNUSED,
        exactly as there: stage 2 is a plain AE decode with no sampling
        loop (the diffusion happens in decode_stage1to2)."""
        fn = self._cached_jit("stage2", lambda p, z: self.model.apply(
            p, z, method=LatentAudioDiffusionAutoencoder.decode_first_stage))
        return fn(self.params, jnp.clip(first_stage_sampled, -1, 1))

    def decode(self, reps, steps: int = 100):
        return self.decode_stage2(self.decode_stage1to2(reps, steps=steps), steps=steps)

    def setup(self, gdrive: bool = True):
        """Download/verify + pour the torch checkpoint into flax params,
        with the EMA swap (reference given_models.py:404-422: strict load
        then diffusion=diffusion_ema / latent_encoder=latent_encoder_ema)."""
        print(f"{self.name}: attempting to load checkpoint "
              f"{self.ckpt_info['ckpt_path']}")
        self.get_checkpoint(gdrive=gdrive)
        self._ensure_params()
        try:
            from .checkpoint import load_torch_checkpoint
            from .convert import convert_stacked_state_dict
            sd = load_torch_checkpoint(
                os.path.expanduser(self.ckpt_info['ckpt_path']))
            print(f"{self.name}: loaded torch state dict ({len(sd)} tensors)")
            self.params, hits, _ = convert_stacked_state_dict(sd, self.params)
            self._jit_cache.clear()     # drop programs closed over old params
        except Exception as e:
            print(f"Sorry, exception = {e}. Going with random weights")
        print(f"{self.name}: Setup completed.")


class DMAE1d(GivenModelClass):
    """archinet DiffusionAE wrapper (reference given_models.py:438-508):
    48k<->44.1k resampling around a mel-encoder diffusion AE; decode is
    50-step sampling.

    models.dmae rebuilds the wrapped architecture itself — MelE1d tower to
    32-d tanh latents, LTPlugin (128-filter/stride-64 learned transform)
    around a UNetV0 with the latent injected at depth 4 (reference
    given_models.py:449-478) — so `model_state_dict` checkpoints pour
    module-for-module (numerically certified vs the in-repo torch mirror,
    tests/test_convert_parity.py).
    """

    def __init__(self, debug: bool = False, model_kwargs: Optional[dict] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.debug = debug
        self.ckpt_info = {
            'ckpt_url': 'https://drive.google.com/file/d/1KKwPbM_Qmu5QvpAs3DdRaYlkaRTG-WJv/view?usp=share_link',
            'ckpt_path': '~/checkpoints/dmae1d_checkpoint.ckpt',
            'ckpt_hash': 'a11a9c68e5962830b142202e25b3080f553a3a73cd944225b3c7d21fe8c631e9'}
        from .models.dmae import DiffusionAE1d
        self.model = DiffusionAE1d(**(model_kwargs or {}))
        self._cfg = {'downsample': self.model.downsampling_ratio}
        self.params = None
        self.num_steps = 50

    def _ensure_params(self, example_len: int = 2 ** 15):
        if self.params is None:
            x = jnp.zeros((1, 2, example_len))
            self.params = fast_random_params(self.model, self.next_key(), x,
                                             jnp.zeros((1,)))

    def _pre(self, waveform_in):
        waveform_in = jnp.asarray(waveform_in)
        self.orig_shape = waveform_in.shape
        w = resample(waveform_in, 48000, 44100)
        return self.zero_pad_po2(w)

    def encode(self, waveform_in, *args, **kwargs):
        w = self._pre(waveform_in)
        self._ensure_params(w.shape[-1])
        fn = self._cached_jit(f"enc{w.shape}", lambda p, x: self.model.apply(
            p, x, method=type(self.model).encode))
        return fn(self.params, w)

    def decode(self, latents, *args, num_steps: Optional[int] = None, **kwargs):
        steps = num_steps or self.num_steps
        self._ensure_params()
        t_out = latents.shape[-1] * self._cfg['downsample']
        noise = host_normal(self.next_key(),
                                  (latents.shape[0], 2, t_out))

        def fn(p, n, z):
            model_fn = lambda x, t, cond: self.model.apply(
                p, x, t, cond, method=type(self.model).decode_v)
            return vddim_sample(model_fn, n, steps, 0, z)

        out = self._cached_jit(f"dec{steps}_{latents.shape}", fn)(
            self.params, noise, latents)
        out = resample(out, 44100, 48000)
        return self.match_sizes(out)

    def forward(self, waveform_in, *args, **kwargs):
        return self.decode(self.encode(waveform_in))

    def setup(self, gdrive: bool = True):
        """Load + pour the `model_state_dict` checkpoint (reference
        given_models.py:500-506 loads it strict=True onto the torch module;
        here the re-architected towers take every shape-matching tensor and
        report the remainder)."""
        print(f"{self.name}: attempting to load checkpoint "
              f"{os.path.expanduser(self.ckpt_info['ckpt_path'])}")
        self.get_checkpoint(gdrive=gdrive)
        self._ensure_params()
        try:
            from .checkpoint import load_torch_checkpoint
            from .convert import convert_dmae_state_dict
            sd = load_torch_checkpoint(os.path.expanduser(self.ckpt_info['ckpt_path']))
            print(f"{self.name}: loaded torch state dict ({len(sd)} tensors)")
            self.params, hits, _ = convert_dmae_state_dict(sd, self.params)
            self._jit_cache.clear()
        except Exception as e:
            print(f"Sorry, exception = {e}. Going with random weights")


class RAVEWrapper(GivenModelClass):
    """RAVE wrapper (reference given_models.py:511-557). The reference
    tolerates a missing `rave` package (got_rave=False no-op, :19-25) and
    loads IRCAM TorchScript exports; here models.rave rebuilds the RAVE
    v2 architecture itself (the `v2.gin` family the reference's
    config_path default points at), so .ts/.ckpt state dicts pour
    tensor-for-tensor (weight-norm fused, exported latent-PCA applied)
    and the wrapper is always functional, checkpoint or not."""

    def __init__(self, pretrained_name: str = '', checkpoint_file: str = 'percussion',
                 config_path: str = './v2.gin', debug: bool = True,
                 latent_dim: int = 128, n_bands: int = 16, **model_kwargs):
        kwargs = {k: model_kwargs.pop(k)
                  for k in ("zero_pad", "make_sizes_match", "ckpt_info",
                            "seed") if k in model_kwargs}
        super().__init__(**kwargs)
        self.config_path = config_path
        self.debug = debug
        if Path(checkpoint_file).suffix == '':
            checkpoint_file += '.ts'
        self.ckpt_info = {'ckpt_url': 'https://play.forum.ircam.fr/rave-vst-api/get_model/'
                                      + Path(checkpoint_file).stem,
                          'ckpt_hash': '', 'gdrive_path': '',
                          'ckpt_path': f'{self.ckpt_dir}/{checkpoint_file}'}
        from .models.rave import RAVE
        self.model = RAVE(latent_dim=latent_dim, n_bands=n_bands,
                          **model_kwargs)
        self.params = None

    def _ensure_params(self, example_len: int = 65536):
        if self.params is None:
            x = jnp.zeros((1, 1, example_len))
            self.params = fast_random_params(self.model, self.next_key(), x)

    def setup(self, gdrive: bool = False):
        """Load RAVE weights: TorchScript archives (.ts) via torch.jit.load
        -> state_dict (reference given_models.py:539-541), Lightning .ckpt
        via its 'state_dict' key (:542-543); both pour by shape signature."""
        self.get_checkpoint(gdrive=gdrive)
        path = os.path.expanduser(self.ckpt_info['ckpt_path'])
        ext = Path(path).suffix
        if self.debug:
            print("extension =", ext)
        self._ensure_params()
        sd = None
        try:
            if ext in ('.ts', '') and os.path.exists(path):
                from .convert import load_torchscript_state_dict
                sd = load_torchscript_state_dict(path)
            elif ext == '.ckpt' and os.path.exists(path):
                from .checkpoint import load_torch_checkpoint
                sd = load_torch_checkpoint(path)
            elif os.path.exists(path):
                print(f"Sorry, we don't know how to load {ext} checkpoint "
                      "files. Weights will be uninitialized.")
        except Exception as e:
            print(f"Sorry, exception = {e}. Going with random weights")
        if sd:
            print(f"{self.name}: loaded state dict ({len(sd)} tensors)")
            from .convert import (convert_rave_state_dict,
                                  extract_rave_latent_transform)
            self.params, hits, _ = convert_rave_state_dict(sd, self.params)
            # exported RAVE models rotate latents by a learned PCA and
            # crop to the informative dims; mirror that transform so
            # encode() latents match the TorchScript model's
            pca, mean = extract_rave_latent_transform(sd)
            if pca is not None and mean is not None \
                    and pca.shape[-1] == self.model.latent_dim:
                self.latent_pca = jnp.asarray(pca)
                self.latent_mean = jnp.asarray(mean)
                print(f"{self.name}: applying exported latent PCA "
                      f"({pca.shape[0]} of {pca.shape[1]} dims)")
            self._jit_cache.clear()

    latent_pca = None
    latent_mean = None

    def encode(self, waveform, **kwargs):
        waveform = jnp.asarray(waveform)
        if waveform.ndim == 2:
            waveform = waveform[None]
        self._ensure_params(waveform.shape[-1])
        fn = self._cached_jit(f"enc{waveform.shape}", lambda p, x: self.model.apply(
            p, x, method=type(self.model).encode))
        z = fn(self.params, waveform)
        if self.latent_pca is not None:
            z = jnp.einsum('ij,bjt->bit', self.latent_pca,
                           z - self.latent_mean[None, :, None])
        return z

    def decode(self, reps, **kwargs):
        reps = jnp.asarray(reps)
        if self.latent_pca is not None:
            # PCA rows are orthonormal: inverse = transpose (+ mean).
            # A cropped export (rows < latent_dim) zero-fills the
            # uninformative dims, exactly like the .ts decode path.
            reps = jnp.einsum('ji,bjt->bit', self.latent_pca, reps) \
                + self.latent_mean[None, :, None]
        fn = self._cached_jit(f"dec{reps.shape}", lambda p, z: self.model.apply(
            p, z, method=type(self.model).decode))
        return fn(self.params, reps)


class CLAPDAE(GivenModelClass):
    """CLAP embedder + stacked latent diffusion generator — the MIRAGE model
    (reference given_models.py:560-709)."""

    def __init__(self, clap_fusion: bool = True, clap_amodel: str = 'HTSAT-base',
                 device=None,
                 first_stage_config: Optional[dict] = None,
                 sample_size: int = 1048576, debug: bool = True,
                 model_kwargs: Optional[dict] = None,
                 clap_kwargs: Optional[dict] = None, **kwargs):
        super().__init__(**kwargs)
        self.debug = debug
        self.sample_size = sample_size
        self.demo_samples = sample_size
        # explicit non-default sample_size survives setup() (tiny/test configs)
        self._explicit_sample_size = sample_size != 1048576
        self.first_stage_config = first_stage_config or \
            {"capacity": 64, "c_mults": [2, 4, 8, 16, 32],
             "strides": [2, 2, 2, 2, 2], "latent_dim": 32}

        self.clap_module = CLAPModule(enable_fusion=clap_fusion,
                                      amodel=clap_amodel, **(clap_kwargs or {}))
        self.embedder = self.encoder = self.clap_module
        self.clap_setup = False

        import dataclasses

        fsc = self.first_stage_config
        mk = dict(model_kwargs or {})
        if "factors2" in mk:        # disambiguate: UNet factors vs diffae factors
            mk["ldm_factors"] = mk.pop("factors2")
        diffae_fields = {f.name for f in dataclasses.fields(LatentAudioDiffusionAutoencoder)
                         if f.name not in ("parent", "name")}
        ldm_fields = {f.name for f in dataclasses.fields(StackedAELatentDiffusionCond)
                      if f.name not in ("parent", "name", "latent_dim", "factors")}
        diffae_kwargs = {k: v for k, v in mk.items() if k in diffae_fields}
        ldm_kwargs = {k: v for k, v in mk.items() if k in ldm_fields}
        if "ldm_factors" in mk:
            ldm_kwargs["factors"] = mk["ldm_factors"]
        self.latent_diffae = LatentAudioDiffusionAutoencoder(
            latent_dim=fsc["latent_dim"], ae_capacity=fsc["capacity"],
            ae_c_mults=tuple(fsc["c_mults"]), ae_strides=tuple(fsc["strides"]),
            **diffae_kwargs)
        self.latent_diffae_setup = False

        self.latent_diffusion_model = StackedAELatentDiffusionCond(
            latent_dim=self.latent_diffae.second_stage_latent_dim,
            **ldm_kwargs)
        self.model = self.latent_diffusion_model
        self.latent_dim = self.latent_diffae.second_stage_latent_dim
        self.downsampling_ratio = self.latent_diffae.downsampling_ratio

        self.ldm_params = None
        self.diffae_params = None

    def _ensure_params(self, example_len: int = 8192):
        if self.diffae_params is None:
            x = jnp.zeros((1, 2, example_len))
            self.diffae_params = fast_random_params(
                self.latent_diffae, self.next_key(), x, jnp.zeros((1,)))
        if self.ldm_params is None:
            z = jnp.zeros((1, self.latent_dim,
                           max(64, example_len // self.downsampling_ratio)))
            emb = jnp.zeros((1, 1, 512))
            self.ldm_params = fast_random_params(
                self.latent_diffusion_model,
                {"params": self.next_key(), "cfg": self.next_key()},
                z, jnp.zeros((1,)), embedding=emb)

    def embed(self, x, *args, **kwargs):
        """Audio (C,T)/(B,C,T) or text str -> (1, 1, 512) embedding
        (reference :588-605)."""
        if isinstance(x, str):
            print(" embed: got text")
            emb = self.clap_module.get_text_embedding([x, ""])[:1, :]
        else:
            demo_reals = jnp.asarray(x)
            while demo_reals.ndim < 3:
                demo_reals = demo_reals[None]
            mono = demo_reals.mean(axis=1)
            emb = self.clap_module.get_audio_embedding_from_data(mono)
        return emb[:, None, :]                              # (B, 1, 512)

    def encode(self, demo_reals, *args, **kwargs):
        return self.embed(demo_reals, *args, **kwargs)

    def encode_audio_latents(self, audio):
        """init-audio path: audio -> stage-2 latents (for mirage init_audio,
        reference mirage.py:392-409)."""
        self._ensure_params(jnp.asarray(audio).shape[-1])
        fn = self._cached_jit("aud_lat", lambda p, x: self.latent_diffae.apply(
            p, x, method=LatentAudioDiffusionAutoencoder.encode))
        return fn(self.diffae_params, jnp.asarray(audio))

    def half(self, dtype=jnp.bfloat16):
        """Cast the diffusion stages to bf16 — the reference's fp16
        toggle (mirage.py:113-124 half_it, default on in the app). The
        CLAP embedder stays f32 (one forward per prompt; its cost is
        irrelevant and text/audio embedding parity is bit-sensitive).
        Returns self. Measured: the f32 stages ran the outer UNet convs
        at ~30 TF/s — a quarter of the bf16 conv rate.

        NOTE: half() CONSUMES the f32 param buffers (the cast program
        donates its input so the f32 copies are freed as it casts —
        without donation both precisions coexist in HBM). Any reference
        taken to `self.ldm_params` / `self.diffae_params` BEFORE calling
        half() points at deleted buffers afterwards; snapshot params for
        checkpointing only AFTER half(), or jax.device_get them first."""
        def cast(tree):
            # one jitted program for the whole tree: ~1,400 EAGER per-leaf
            # casts over the axon relay measured 31.6 s; one compiled
            # donate-input cast program is sub-second and frees the f32
            # copies as it goes
            f = jax.jit(lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t),
                donate_argnums=0)
            return f(tree)
        self._ensure_params()
        self.ldm_params = cast(self.ldm_params)
        self.diffae_params = cast(self.diffae_params)
        self._jit_cache.clear()
        return self

    def generate(self, audio_embeddings, cfg_scales=4, demo_steps: int = 150,
                 outer_steps: int = 100, init_audio_latents=None,
                 init_strength: float = 0.4, batch_size: int = 1,
                 flatten: bool = True, **kwargs):
        """CFG latent diffusion -> stage decode -> audio
        (reference given_models.py:612-647)."""
        self._ensure_params()
        # compute dtype follows the params (see half()): mixed f32 noise
        # would silently promote every matmul back to f32
        cdtype = jax.tree_util.tree_leaves(self.ldm_params)[0].dtype
        embeddings = host_cast(audio_embeddings, cdtype)
        if isinstance(cfg_scales, list):
            cfg_scales = cfg_scales[0]
        cfg_scale = float(cfg_scales)
        n_latent = self.demo_samples // self.downsampling_ratio
        stage_times = os.environ.get("AA_GEN_STAGE_TIMES", "0") == "1"
        if stage_times:
            import time as _time
            _t0 = _time.time()

        # Every stage below runs as ONE cached jitted program (the
        # DVAEWrapper.decode pattern): called eagerly, the samplers'
        # lax.scan re-traces per call and each surrounding op is its own
        # dispatch over the axon relay — measured 110 ms/step wall for a
        # 26 ms/step program on the inner stage (3-4x the device time).
        # Params ride as arguments so checkpoint pours can't go stale.
        def ldm_fn(p, t_len):
            """UNetCFG1d step fn with the rel-pos biases hoisted out of
            the sampler loop (they depend only on params + static T;
            rebuilding them cost ~10 ms of the 27 ms B=1 inner forward)."""
            rb = None
            if os.environ.get("AA_RELPOS_HOIST", "1") == "1":
                from .models.unet_cfg1d import precompute_rel_biases
                rb = precompute_rel_biases(
                    self.latent_diffusion_model,
                    p["params"]["diffusion"], t_len)
            # sequence fold on the conv-only levels (pick_cfg_fold inside
            # the model no-ops once the CFG-doubled batch fills a 16-row
            # sublane tile, so this is only live at small serving batches)
            fb = 1 if os.environ.get("AA_INNER_FOLD", "1") == "1" else 0
            return lambda x, t, embedding: \
                self.latent_diffusion_model.apply(
                    p, x, t, embedding=embedding,
                    embedding_scale=cfg_scale, rel_biases=rb,
                    fold_blocks=fb)

        if init_audio_latents is not None:
            print("   Calling ldc_resample")
            init_lat = host_cast(init_audio_latents, cdtype)

            def resample_fn(p, lat, emb, key):
                fn = ldm_fn(p, lat.shape[-1])
                out = resample_diffusion(
                    fn, lat, steps=demo_steps,
                    noise_level=(1.0 - init_strength), key=key,
                    embedding=emb)
                return jnp.clip(out, -1, 1)

            fake_latents = self._cached_jit(
                f"ldc_resample{demo_steps}_{init_lat.shape}_{cfg_scale}"
                f"_{init_strength}", resample_fn)(
                self.ldm_params, init_lat, embeddings, self.next_key())
        else:
            print("   Calling ldc_sample")
            latent_noise = host_normal(
                self.next_key(), (batch_size, self.latent_dim, n_latent),
                dtype=cdtype)

            def sample_fn(p, noise, emb):
                fn = ldm_fn(p, noise.shape[-1])
                return jnp.clip(
                    kdiff_sample(fn, noise, demo_steps, embedding=emb),
                    -1, 1)

            fake_latents = self._cached_jit(
                f"ldc_sample{demo_steps}_{latent_noise.shape}_{cfg_scale}",
                sample_fn)(self.ldm_params, latent_noise, embeddings)

        if stage_times:
            jax.block_until_ready(fake_latents)
            self.last_stage_times = {"inner_s": _time.time() - _t0}
            _t0 = _time.time()
        print(f"Decoding fake_latents of shape {fake_latents.shape} "
              f"to audio length {self.sample_size}")
        # stage-1 latents via cond diffusion, then AE decode — one jitted
        # program per micro-batch. The outer stage + AE decode are the
        # memory-heavy part (the AE intermediates reach full audio rate):
        # at the reference's max variation batch 8 (reference
        # mirage.py:696) they exceed 16 GB HBM, so decode in
        # micro-batches — batch items are independent through every op
        # here, so chunking is numerically identical.
        s1_noise = host_normal(
            self.next_key(),
            (fake_latents.shape[0], self.latent_diffae.latent_dim,
             fake_latents.shape[2] * self.latent_diffae.latent_downsampling_ratio),
            dtype=cdtype)
        from .models.blocks import turbo_int8

        def outer_decode_fn(p, noise, lat, key):
            from .parallel.fold import decode_unet_seqfold, seqfold_ok
            from .models.blocks import turbo_batch_ok
            if turbo_int8() and turbo_batch_ok(noise.shape[0]):
                # amax-carry through the outer v-DDIM loop (same contract
                # as the DVAE decode): grids ride the sampler carry
                s1_fn = lambda x, t, aux, cond: self.latent_diffae.apply(
                    p, x, t, cond, q_aux=aux,
                    method=LatentAudioDiffusionAutoencoder.diffusion_v_aux)
                first = vddim_sample(s1_fn, noise, outer_steps, 0, lat,
                                     key=key, aux_mode=True)
            elif seqfold_ok(noise.shape[0]) or turbo_int8():
                # small-batch serving: fold time blocks into batch — the
                # B<=2 conv MXU cliff (outer forward 87.6 -> 19.4 ms at
                # B=1; docs/performance.md "Serving B=1"). With turbo on
                # below the unfolded-turbo threshold (B<16) the fold is
                # ALSO the int8 on-ramp: it refills the 32-row int8 tiles
                # bf16-fold alone wouldn't (B=4 folds 8x to 32 rows).
                la = self.latent_diffae
                ucfg = dict(io_channels=la.latent_dim,
                            cond_dim=la.second_stage_latent_dim,
                            n_attn_layers=0,
                            c_mults=tuple(la.diffusion_c_mults),
                            depth=la.diffusion_depth)
                # turbo rides INSIDE the fold at small batch: the folded
                # view has B*n_blocks rows, so the int8 convs see full
                # 32-row tiles even at B=1 (exact dynamic amax per call —
                # no aux carry needed)
                s1_fn = lambda x, t, cond: decode_unet_seqfold(
                    p["params"]["diffusion"], x, t, cond,
                    quantized=turbo_int8(), **ucfg)
                first = vddim_sample(s1_fn, noise, outer_steps, 0, lat,
                                     key=key)
            else:
                s1_fn = lambda x, t, cond: self.latent_diffae.apply(
                    p, x, t, cond,
                    method=LatentAudioDiffusionAutoencoder.diffusion_v)
                first = vddim_sample(s1_fn, noise, outer_steps, 0, lat,
                                     key=key)
            return self.latent_diffae.apply(
                p, jnp.clip(first, -1, 1),
                method=LatentAudioDiffusionAutoencoder.decode_first_stage)

        mdb = int(os.environ.get("AA_MIRAGE_DECODE_BATCH", 4))
        bsz = fake_latents.shape[0]
        parts = []
        for i in range(0, bsz, max(mdb, 1)):
            sl = slice(i, min(i + max(mdb, 1), bsz))
            fn = self._cached_jit(
                f"outer_decode{outer_steps}_{s1_noise[sl].shape}",
                outer_decode_fn)
            parts.append(fn(self.diffae_params, s1_noise[sl],
                            fake_latents[sl], self.next_key()))
        fakes = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        if stage_times:
            jax.block_until_ready(fakes)
            self.last_stage_times["outer_s"] = _time.time() - _t0
        if flatten:
            b, d, n = fakes.shape
            fakes = jnp.swapaxes(fakes, 0, 1).reshape(d, b * n)
        return fakes, fake_latents

    def generate_seqpar(self, audio_embeddings, mesh, axis: str = "seq",
                        cfg_scales=4, demo_steps: int = 150,
                        outer_steps: int = 100, batch_size: int = 1,
                        flatten: bool = True,
                        sharded_levels: Optional[int] = None):
        """generate() with the OUTER stage sequence-parallel over
        mesh[`axis`]: the 100-step stage-1 diffusion — virtually all of
        MIRAGE's FLOPs, at the audio-rate-/32 sequence — runs through
        parallel.decode_unet_seqpar (halo convs + psum GroupNorm stats
        over ICI; the stacked UNet has no attention so every level but
        the bottleneck can shard). The inner CFG latent stage (tiny T)
        stays single-program, and the single AE-decode forward (<1% of
        outer-stage FLOPs) runs replicated on every shard. Multi-chip
        latency path for one generation at batch 1 — the reference can
        only batch variations on one GPU (reference mirage.py:696).

        Draws RNG in the same order as generate(), so with the same
        starting key the two produce the same audio (asserted in
        tests/test_seqpar_unet.py)."""
        from .parallel.infer import decode_unet_seqpar
        self._ensure_params()
        cdtype = jax.tree_util.tree_leaves(self.ldm_params)[0].dtype
        embeddings = host_cast(audio_embeddings, cdtype)
        if isinstance(cfg_scales, list):
            cfg_scales = cfg_scales[0]
        cfg_scale = float(cfg_scales)
        n_latent = self.demo_samples // self.downsampling_ratio

        latent_noise = host_normal(
            self.next_key(), (batch_size, self.latent_dim, n_latent),
            dtype=cdtype)

        def sample_fn(p, noise, emb):
            rb = None
            if os.environ.get("AA_RELPOS_HOIST", "1") == "1":
                from .models.unet_cfg1d import precompute_rel_biases
                rb = precompute_rel_biases(
                    self.latent_diffusion_model,
                    p["params"]["diffusion"], noise.shape[-1])
            fn = lambda x, t, embedding: \
                self.latent_diffusion_model.apply(
                    p, x, t, embedding=embedding,
                    embedding_scale=cfg_scale, rel_biases=rb)
            return jnp.clip(
                kdiff_sample(fn, noise, demo_steps, embedding=emb),
                -1, 1)

        fake_latents = self._cached_jit(
            f"ldc_sample{demo_steps}_{latent_noise.shape}_{cfg_scale}",
            sample_fn)(self.ldm_params, latent_noise, embeddings)

        la = self.latent_diffae
        s1_noise = host_normal(
            self.next_key(),
            (batch_size, la.latent_dim,
             fake_latents.shape[2] * la.latent_downsampling_ratio),
            dtype=cdtype)
        ucfg = dict(io_channels=la.latent_dim,
                    cond_dim=la.second_stage_latent_dim,
                    n_attn_layers=0, c_mults=tuple(la.diffusion_c_mults),
                    depth=la.diffusion_depth)

        def outer_seqpar_fn(p, noise, lat, key):
            s1_fn = lambda x, t, cond: decode_unet_seqpar(
                p["params"]["diffusion"], x, t, cond, mesh=mesh, axis=axis,
                sharded_levels=sharded_levels, **ucfg)
            first = vddim_sample(s1_fn, noise, outer_steps, 0, lat, key=key)
            return la.apply(
                p, jnp.clip(first, -1, 1),
                method=LatentAudioDiffusionAutoencoder.decode_first_stage)

        mesh_id = tuple(d.id for d in mesh.devices.flat)
        fakes = self._cached_jit(
            f"outer_seqpar{outer_steps}_{s1_noise.shape}_{axis}"
            f"{mesh.shape[axis]}_lv{sharded_levels}_m{mesh_id}",
            outer_seqpar_fn)(
            self.diffae_params, s1_noise, fake_latents, self.next_key())
        if flatten:
            b, d, n = fakes.shape
            fakes = jnp.swapaxes(fakes, 0, 1).reshape(d, b * n)
        return fakes, fake_latents

    def decode(self, *args, **kwargs):
        return self.generate(*args, **kwargs)

    def forward(self, waveform_in, *args, **kwargs):
        embeddings = self.encode(waveform_in, *args, **kwargs)
        return self.decode(embeddings, **kwargs)

    def setup(self, gdrive: bool = True, model_len: str = '22s'):
        """Load the three checkpoints from env vars (reference :659-708):
        LATENT_DIFFAE_CKPT, CLAP_CKPT, CLAPDAE_CKPT_{22s,66s}; random
        weights when absent."""
        print("\n ====== Setting up StackedAELatentCond ======")
        from .checkpoint import load_torch_checkpoint
        from .convert import (convert_stacked_state_dict,
                              convert_ldm_state_dict)

        self._ensure_params()
        if not self.latent_diffae_setup:
            path = os.environ.get('LATENT_DIFFAE_CKPT', '')
            if path and os.path.exists(os.path.expanduser(path)):
                try:
                    sd = load_torch_checkpoint(path)
                    print(f"Loaded Latent DiffAE state dict ({len(sd)} tensors)")
                    self.diffae_params, _, _ = convert_stacked_state_dict(
                        sd, self.diffae_params)
                except Exception as e:
                    print(f"Sorry, exception = {e}. Going with random weights")
            self.latent_diffae_setup = True
        if not self.clap_setup:
            clap_path = os.environ.get('CLAP_CKPT', '')
            if clap_path:
                self.clap_module.load_ckpt(ckpt=clap_path, verbose=self.debug)
            self.clap_setup = True
        ckpt_path = os.environ.get(f'CLAPDAE_CKPT_{model_len}', '')
        if not self._explicit_sample_size:
            self.sample_size = 1048576      # 22 s default (reference :696-698)
            if model_len == '66s':
                self.sample_size *= 3
        self.demo_samples = self.sample_size
        if ckpt_path and os.path.exists(os.path.expanduser(ckpt_path)):
            try:
                sd = load_torch_checkpoint(ckpt_path)
                print(f"Loaded StackedAELatentDiffusionCond state dict "
                      f"({len(sd)} tensors)")
                self.ldm_params, _, _ = convert_ldm_state_dict(
                    sd, self.ldm_params)
                # the generator ckpt also carries the stage-1 stack under
                # latent_ae.* (Lightning saves submodules); pour it too so a
                # single ckpt restores the full generate() path
                latent_ae_sd = {k[len("latent_ae."):]: v for k, v in sd.items()
                                if k.startswith("latent_ae.")}
                if latent_ae_sd:
                    self.diffae_params, _, _ = convert_stacked_state_dict(
                        latent_ae_sd, self.diffae_params)
                self._jit_cache.clear()
            except Exception as e:
                print(f"Sorry, exception = {e}. Going with random weights")
        else:
            print("StackedAELatentDiffusionCond: starting from scratch!")
        print(f"Success! {self.name} is ready to go.")
        self.already_setup = True
