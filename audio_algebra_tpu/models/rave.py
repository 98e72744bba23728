"""RAVE v2 — IRCAM's realtime neural audio codec, rebuilt in JAX/flax.

The reference wraps RAVE behind RAVEWrapper (reference
given_models.py:511-557), loading IRCAM TorchScript exports and calling
`model.encode`/`model.decode`. This module rebuilds the RAVE **v2**
architecture itself (the `v2.gin` family the reference's `config_path`
default points at) so real RAVE v2 state dicts pour tensor-for-tensor:

  * PQMF multiband front-end (16 bands, high attenuation);
  * EncoderV2: conv-in -> per-ratio [dilated residual units ->
    leaky-ReLU -> strided down conv, channels x2] -> conv-out emitting
    (mean, scale) for the variational bottleneck (n_out=2);
  * reparameterisation `z = mean + (softplus(scale) + 1e-4) * eps`
    (mean at inference — what the exported `encode` returns);
  * GeneratorV2: conv-in -> per-ratio [leaky-ReLU -> transposed up conv,
    channels /2 -> dilated residual units] -> two heads over the final
    band-rate features: a waveform head with amplitude modulation
    (`wave * mod_sigmoid(amp)`, mod_sigmoid(x) = 2·sigmoid(x)^2.3 + 1e-7)
    and a filtered-noise head (NoiseGenerator: strided convs ->
    per-frame noise-band magnitudes -> zero-phase impulse responses ->
    FFT-convolved uniform noise), summed as `tanh(wave) + noise`, then
    PQMF synthesis.

Where exact hyperparameters are gin-config choices, they are fields here
(kernel sizes, dilations, noise ratios/bands) with v2 defaults; a real
checkpoint with different gin settings pours by adjusting the fields.
All convs carry torch `weight_norm` in the original — the converter
(convert.convert_rave_state_dict) fuses `weight_g`/`weight_v` (and the
newer `parametrizations.weight.original{0,1}`) before pouring, so this
module holds plain fused kernels.

TPU-first: channels-last compute through blocks.Conv1d (MXU-shaped
matmul convs), `nn.ConvTranspose(padding="SAME", transpose_kernel=True)`
for the upsamplers (numerically certified against torch semantics in
tests/test_convert_parity.py for the same pattern), and the noise head's
per-frame filtering as one batched rfft/irfft pair — no Python loops.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pqmf import PQMF
from .blocks import Conv1d


def leaky(x, slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def mod_sigmoid(x):
    """RAVE's strictly-positive amplitude nonlinearity."""
    return 2.0 * jax.nn.sigmoid(x) ** 2.3 + 1e-7


class DilatedUnit(nn.Module):
    """Residual dilated unit: act -> dilated k-conv -> act -> 1-conv, +x."""
    dim: int
    kernel_size: int = 3
    dilation: int = 1

    def setup(self):
        self.conv_a = Conv1d(self.dim, kernel_size=self.kernel_size,
                             dilation=self.dilation)
        self.conv_b = Conv1d(self.dim, kernel_size=1)

    def __call__(self, x):
        h = self.conv_a(leaky(x))
        h = self.conv_b(leaky(h))
        return x + h


class EncoderV2(nn.Module):
    """RAVE v2 encoder over PQMF bands: (B, T, n_band) channels-last ->
    (B, T/prod(ratios), n_out*latent_size)."""
    capacity: int
    ratios: Sequence[int]
    latent_size: int
    dilations: Sequence[Sequence[int]]
    n_out: int = 2
    kernel_size: int = 3

    def setup(self):
        # forward-order, zero-padded names: natural sort == definition
        # order == torch Sequential order (the pour contract)
        self.conv_in = Conv1d(self.capacity,
                              kernel_size=2 * self.kernel_size + 1)
        units, downs = [], []
        ch = self.capacity
        for li, (r, dils) in enumerate(zip(self.ratios, self.dilations)):
            units.append([DilatedUnit(ch, self.kernel_size, d,
                                      name=f"lvl{li}_unit{ui}")
                          for ui, d in enumerate(dils)])
            ch *= 2
            downs.append(Conv1d(ch, kernel_size=2 * r, stride=r,
                                name=f"lvl{li}_zdown"))
        self.units, self.downs = units, downs
        self.conv_out = Conv1d(self.n_out * self.latent_size,
                               kernel_size=2 * self.kernel_size + 1)

    def __call__(self, x):
        x = self.conv_in(x)
        for lvl_units, down in zip(self.units, self.downs):
            for u in lvl_units:
                x = u(x)
            x = down(leaky(x))
        return self.conv_out(leaky(x))


class NoiseGenerator(nn.Module):
    """Filtered-noise head: band-rate features -> per-frame noise-band
    magnitudes -> zero-phase IRs -> FFT-convolve uniform noise.

    Output is band-rate noise (B, T, data_size): each conv-net output
    frame (rate T/prod(ratios)) contributes `prod(ratios)` samples of
    noise shaped by that frame's magnitude response.
    """
    data_size: int
    hidden: int = 64          # intermediate width == generator's final ch
    ratios: Sequence[int] = (4, 4, 4)
    noise_bands: int = 5
    kernel_size: int = 3

    def setup(self):
        cs = []
        for i, r in enumerate(self.ratios):
            feats = self.data_size * self.noise_bands \
                if i == len(self.ratios) - 1 else self.hidden
            cs.append(Conv1d(feats, kernel_size=self.kernel_size, stride=r,
                             name=f"net{i}"))
        self.net = cs

    @property
    def target_size(self) -> int:
        p = 1
        for r in self.ratios:
            p *= r
        return p

    def __call__(self, x, noise: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None):
        h = x
        for i, c in enumerate(self.net):
            if i:
                h = leaky(h)
            h = c(h)
        amp = mod_sigmoid(h - 5.0)                     # (B, Tn, D*nb)
        b, tn, _ = amp.shape
        amp = amp.reshape(b, tn, self.data_size, self.noise_bands)
        ir = _amp_to_impulse_response(amp, self.target_size)
        if noise is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            noise = jax.random.uniform(key, ir.shape, minval=-1.0,
                                       maxval=1.0)
        out = _fft_convolve(noise, ir)                 # (B, Tn, D, target)
        out = jnp.swapaxes(out, 1, 2)                  # (B, D, Tn, target)
        out = out.reshape(b, self.data_size, tn * self.target_size)
        return jnp.swapaxes(out, 1, 2)                 # (B, T, D)


def _amp_to_impulse_response(amp: jnp.ndarray, target_size: int):
    """Magnitudes (treated as a zero-phase real spectrum) -> centered,
    Hann-windowed impulse response padded to `target_size`."""
    ir = jnp.fft.irfft(amp.astype(jnp.complex64))
    filter_size = ir.shape[-1]
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    n = jnp.arange(filter_size)
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * n / filter_size)  # periodic Hann
    ir = ir * win
    ir = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1)
                 + [(0, int(target_size) - int(filter_size))])
    return jnp.roll(ir, -(filter_size // 2), axis=-1)


def _fft_convolve(signal: jnp.ndarray, kernel: jnp.ndarray):
    """Linear convolution of same-length last axes via 2x zero-padding,
    keeping the aligned (second) half."""
    n = signal.shape[-1]
    sig = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, n)])
    ker = jnp.pad(kernel, [(0, 0)] * (kernel.ndim - 1) + [(n, 0)])
    out = jnp.fft.irfft(jnp.fft.rfft(sig) * jnp.fft.rfft(ker))
    return out[..., out.shape[-1] // 2:]


class GeneratorV2(nn.Module):
    """RAVE v2 decoder: latents (B, Tz, latent_size) channels-last ->
    PQMF bands (B, T, data_size)."""
    data_size: int
    capacity: int
    ratios: Sequence[int]
    latent_size: int
    dilations: Sequence[Sequence[int]]
    kernel_size: int = 3
    amplitude_modulation: bool = True
    use_noise: bool = True
    noise_ratios: Sequence[int] = (4, 4, 4)
    noise_bands: int = 5

    def setup(self):
        ch = self.capacity * 2 ** len(self.ratios)
        self.conv_in = Conv1d(ch, kernel_size=2 * self.kernel_size + 1)
        ups, units = [], []
        # generator runs ratios/dilations in reverse (coarse -> fine)
        for li, (r, dils) in enumerate(zip(self.ratios[::-1],
                                           self.dilations[::-1])):
            ch //= 2
            ups.append(nn.ConvTranspose(
                ch, (2 * r,), strides=(r,), padding="SAME",
                transpose_kernel=True, name=f"lvl{li}_up"))
            units.append([DilatedUnit(ch, self.kernel_size, d,
                                      name=f"lvl{li}_unit{ui}")
                          for ui, d in enumerate(dils)])
        self.ups, self.units = ups, units
        out = 2 * self.data_size if self.amplitude_modulation \
            else self.data_size
        self.waveform_module = Conv1d(out,
                                      kernel_size=2 * self.kernel_size + 1)
        if self.use_noise:
            self.noise_module = NoiseGenerator(
                self.data_size, ratios=tuple(self.noise_ratios),
                noise_bands=self.noise_bands, hidden=ch)

    def __call__(self, z, noise: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None):
        x = self.conv_in(z)
        for up, lvl_units in zip(self.ups, self.units):
            x = up(leaky(x))
            for u in lvl_units:
                x = u(x)
        wav = self.waveform_module(leaky(x))
        if self.amplitude_modulation:
            wav, amp = jnp.split(wav, 2, axis=-1)
            wav = wav * mod_sigmoid(amp)
        bands = jnp.tanh(wav)
        if self.use_noise:
            bands = bands + self.noise_module(x, noise=noise, key=key)
        return bands


class RAVE(nn.Module):
    """Full RAVE v2: PQMF -> variational EncoderV2 -> GeneratorV2 -> PQMF⁻¹.

    Field names keep the wrapper-facing aliases used across this repo
    (`latent_dim`/`n_bands`/`strides` == RAVE's latent_size/n_band/ratios).
    """
    latent_dim: int = 128
    n_bands: int = 16
    capacity: int = 64
    strides: Sequence[int] = (4, 4, 4, 2)
    kernel_size: int = 3
    dilations: Optional[Sequence[Sequence[int]]] = None
    noise_ratios: Sequence[int] = (4, 4, 4)
    noise_bands: int = 5
    amplitude_modulation: bool = True
    use_noise: bool = True
    pqmf_attenuation: float = 100.0

    @property
    def downsampling_ratio(self) -> int:
        p = self.n_bands
        for s in self.strides:
            p *= s
        return p

    def setup(self):
        self.pqmf = PQMF(self.n_bands, self.pqmf_attenuation)
        dils = tuple(self.dilations) if self.dilations is not None \
            else tuple((1, 3, 9) for _ in self.strides)
        self.encoder = EncoderV2(
            capacity=self.capacity, ratios=tuple(self.strides),
            latent_size=self.latent_dim, dilations=dils, n_out=2,
            kernel_size=self.kernel_size)
        self.decoder = GeneratorV2(
            data_size=self.n_bands, capacity=self.capacity,
            ratios=tuple(self.strides), latent_size=self.latent_dim,
            dilations=dils, kernel_size=self.kernel_size,
            amplitude_modulation=self.amplitude_modulation,
            use_noise=self.use_noise,
            noise_ratios=tuple(self.noise_ratios),
            noise_bands=self.noise_bands)

    def encode(self, audio, sample: bool = False,
               key: Optional[jax.Array] = None):
        """(B, 1, T) mono -> (B, latent_dim, T/downsampling_ratio).
        Returns the posterior mean (the exported-model behaviour) unless
        `sample=True` draws z = mean + std*eps."""
        if sample and key is None:
            raise ValueError("encode(sample=True) needs a PRNG `key`; "
                             "omit sample for the deterministic posterior "
                             "mean")
        sub = self.pqmf.analysis(audio)                 # (B, n_bands, T/nb)
        x = jnp.swapaxes(sub, -1, -2)
        stats = self.encoder(x)
        mean, scale = jnp.split(stats, 2, axis=-1)
        if sample:
            std = jax.nn.softplus(scale) + 1e-4
            mean = mean + std * jax.random.normal(key, mean.shape)
        return jnp.swapaxes(mean, -1, -2)

    def encode_bands(self, bands):
        """PQMF bands (B, n_bands, Tb) -> raw posterior stats
        (B, 2*latent_dim, Tz) — the EncoderV2 forward alone."""
        stats = self.encoder(jnp.swapaxes(bands, -1, -2))
        return jnp.swapaxes(stats, -1, -2)

    def decode_bands(self, z, noise: Optional[jnp.ndarray] = None,
                     key: Optional[jax.Array] = None):
        """(B, latent_dim, Tz) -> PQMF bands (B, n_bands, Tb) — the
        GeneratorV2 forward alone."""
        bands = self.decoder(jnp.swapaxes(z, -1, -2), noise=noise, key=key)
        return jnp.swapaxes(bands, -1, -2)

    def encode_stats(self, audio):
        """(mean, std) of the posterior, channels-first — for KL terms."""
        sub = self.pqmf.analysis(audio)
        stats = self.encoder(jnp.swapaxes(sub, -1, -2))
        mean, scale = jnp.split(stats, 2, axis=-1)
        std = jax.nn.softplus(scale) + 1e-4
        return (jnp.swapaxes(mean, -1, -2), jnp.swapaxes(std, -1, -2))

    def decode(self, z, noise: Optional[jnp.ndarray] = None,
               key: Optional[jax.Array] = None):
        """(B, latent_dim, Tz) -> (B, 1, Tz*downsampling_ratio)."""
        bands = self.decoder(jnp.swapaxes(z, -1, -2), noise=noise, key=key)
        return self.pqmf.synthesis(jnp.swapaxes(bands, -1, -2))

    def __call__(self, audio):
        z = self.encode(audio)
        return z, self.decode(z)
