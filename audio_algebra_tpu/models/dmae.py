"""DMAE — archinet DiffusionAE rebuild: UNetV0 + LTPlugin + MelE1d.

The reference wraps archisound's pretrained DMAE as DMAE1d (reference
given_models.py:438-508):

    UNet = LTPlugin(UNetV0, num_filters=128, window_length=128, stride=64)
    DiffusionAE(net_t=UNet, in_channels=2,
                channels=[256, 512, 512, 512, 1024, 1024, 1024],
                factors=[1, 2, 2, 2, 2, 2, 2],
                items=[1, 2, 2, 2, 2, 2, 2],
                linear_attentions=[0, 1, 1, 1, 1, 1, 1],
                attention_features=64, attention_heads=8,
                encoder=MelE1d(in_channels=2, channels=512,
                               multipliers=[1, 1, 1], factors=[2, 2],
                               num_blocks=[4, 8], mel_channels=80,
                               mel_sample_rate=44100, mel_normalize_log=True,
                               out_channels=32, bottleneck=TanhBottleneck()),
                inject_depth=4)

This module rebuilds that architecture TPU-natively (channels-last inside,
conv1d_mm/MXU formulations, static shapes). The a-unet / audio-diffusion-
pytorch packages are not importable in this image, so the UNetV0 micro-
structure here is a reconstruction of the public architecture: per level
[Resnet -> time-FiLM modulation -> context injection -> linear attention]
item stacks around a strided-conv down / transposed-conv up ladder with
concat skips; the latent is concatenated at `inject_depth` (whose rate —
LT stride x prod(factors[:depth+1]) = 64*16 — equals the MelE1d latent
rate hop*prod(enc factors) = 256*4 = /1024 of audio). The checkpoint pour
is certified numerically against the in-repo torch mirror
(tests/test_convert_parity.py::test_dmae_pour_forward_parity); exact leaf
ordering vs the real a-unet state dict is the documented caveat.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mel import melspectrogram
from .blocks import Conv1d, FourierFeatures
from .encoder1d import Encoder1d


class _ResnetItem(nn.Module):
    """GN-SiLU-conv3 x2 + (1x1-projected) residual; channel changes (the
    2c -> c skip-concat reduction on the up path) happen here."""
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups)(x)
        h = nn.silu(h)
        h = Conv1d(self.features, kernel_size=3)(h)
        h = nn.GroupNorm(num_groups=self.groups)(h)
        h = nn.silu(h)
        h = Conv1d(self.features, kernel_size=3)(h)
        skip = x if x.shape[-1] == self.features \
            else Conv1d(self.features, kernel_size=1, use_bias=False)(x)
        return skip + h


class _ModulationItem(nn.Module):
    """AdaGN time modulation: GN (no affine) then (1+scale)*h + shift from
    the shared modulation embedding."""
    groups: int = 8

    @nn.compact
    def __call__(self, x, emb):
        c = x.shape[-1]
        m = nn.Dense(2 * c)(nn.silu(emb))            # (B, 2c)
        s, b = jnp.split(m[:, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=self.groups, use_scale=False,
                         use_bias=False)(x)
        return h * (1 + s) + b


class _InjectItem(nn.Module):
    """Concat the encoder latent along channels, 1x1-conv back to c
    (DiffusionAE's context_channels[inject_depth] path)."""

    @nn.compact
    def __call__(self, x, ctx):
        assert ctx.shape[1] == x.shape[1], \
            f"inject length {ctx.shape[1]} != level length {x.shape[1]}"
        c = x.shape[-1]
        return Conv1d(c, kernel_size=1)(
            jnp.concatenate([x, ctx.astype(x.dtype)], axis=-1))


class _LinearAttentionItem(nn.Module):
    """Pre-norm linear (softmax-kernel) attention + residual: q softmaxed
    over features, k over time; O(T) memory."""
    heads: int = 8
    head_features: int = 64

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        hd, nh = self.head_features, self.heads
        h = nn.GroupNorm(num_groups=1)(x)
        q = nn.Dense(nh * hd, use_bias=False, name="to_q")(h)
        k = nn.Dense(nh * hd, use_bias=False, name="to_k")(h)
        v = nn.Dense(nh * hd, use_bias=False, name="to_v")(h)
        q, k, v = (p.reshape(b, t, nh, hd) for p in (q, k, v))
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * (hd ** -0.5)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
        ctx = jnp.einsum("bshd,bshe->bhde", k, v.astype(jnp.float32))
        y = jnp.einsum("bthd,bhde->bthe", q, ctx).astype(x.dtype)
        return x + nn.Dense(c, name="to_out")(y.reshape(b, t, nh * hd))


class UNetV0(nn.Module):
    """a-unet apex UNetV0 (reconstruction — see module docstring).

    (B, in_channels, T) x t (B,) [x context (B, Cc, Tc)] -> (B,
    out_channels, T). Levels downsample by `factors` (strided conv,
    kernel 2f), run `items[i]` repetitions of
    [Resnet, Modulation, Inject?, LinearAttention?] on the way down AND
    up, concat skips, and upsample with transposed convs.
    """
    in_channels: int = 128
    out_channels: Optional[int] = None
    channels: Sequence[int] = (256, 512, 512, 512, 1024, 1024, 1024)
    factors: Sequence[int] = (1, 2, 2, 2, 2, 2, 2)
    items: Sequence[int] = (1, 2, 2, 2, 2, 2, 2)
    linear_attentions: Sequence[int] = (0, 1, 1, 1, 1, 1, 1)
    context_channels: Sequence[int] = (0, 0, 0, 0, 32, 0, 0)
    attention_features: int = 64
    attention_heads: int = 8
    resnet_groups: int = 8
    modulation_features: int = 1024

    def _level_items(self, h, emb, ctx, i, idx):
        """One level's item stack; returns (h, next idx). Module names are
        forward-order n### so the natural-sort pour pairs in definition
        order (see convert.py:19-27)."""
        c = self.channels[i]
        for _ in range(self.items[i]):
            h = _ResnetItem(c, self.resnet_groups, name=f"n{idx:03d}")(h)
            idx += 1
            h = _ModulationItem(self.resnet_groups, name=f"n{idx:03d}")(h, emb)
            idx += 1
            if self.context_channels[i]:
                h = _InjectItem(name=f"n{idx:03d}")(h, ctx)
                idx += 1
            for _ in range(self.linear_attentions[i]):
                h = _LinearAttentionItem(
                    self.attention_heads, self.attention_features,
                    name=f"n{idx:03d}")(h)
                idx += 1
        return h, idx

    @nn.compact
    def __call__(self, x, t, context=None):
        n = len(self.channels)
        assert len(self.factors) == len(self.items) == n \
            and len(self.linear_attentions) == len(self.context_channels) == n
        if any(self.context_channels):
            assert context is not None, "this UNetV0 expects a context latent"
        h = jnp.swapaxes(x, -1, -2)
        ctx = None if context is None else jnp.swapaxes(context, -1, -2)

        emb = FourierFeatures(256, name="time_ff")(t)
        emb = nn.Dense(self.modulation_features, name="time_mlp_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.modulation_features, name="time_mlp_1")(emb)
        emb = emb.astype(h.dtype)

        idx = 0
        skips = []
        for i in range(n):            # down: strided conv + items
            f = self.factors[i]
            h = Conv1d(self.channels[i],
                       kernel_size=(2 * f if f > 1 else 1), stride=f,
                       name=f"n{idx:03d}")(h)
            idx += 1
            h, idx = self._level_items(h, emb, ctx, i, idx)
            if i < n - 1:
                skips.append(h)
        for i in reversed(range(n)):  # up: (cat skip) + items + transposed conv
            if i < n - 1:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
            h, idx = self._level_items(h, emb, ctx, i, idx)
            f = self.factors[i]
            c_out = (self.out_channels or self.in_channels) if i == 0 \
                else self.channels[i - 1]
            if f > 1:
                h = nn.ConvTranspose(c_out, (2 * f,), strides=(f,),
                                     padding="SAME", transpose_kernel=True,
                                     name=f"n{idx:03d}")(h)
            else:
                h = Conv1d(c_out, kernel_size=1, name=f"n{idx:03d}")(h)
            idx += 1
        return jnp.swapaxes(h, -1, -2)


class LearnedTransform(nn.Module):
    """LTPlugin's learned frame transform (reference given_models.py:449-453:
    num_filters=128, window_length=128, stride=64): analysis = strided conv
    audio -> (B, num_filters, T/stride); synthesis = transposed conv back."""
    num_filters: int = 128
    window_length: int = 128
    stride: int = 64
    audio_channels: int = 2

    def setup(self):
        self.lt_in = Conv1d(self.num_filters, kernel_size=self.window_length,
                            stride=self.stride)
        self.lt_out = nn.ConvTranspose(
            self.audio_channels, (self.window_length,),
            strides=(self.stride,), padding="SAME", transpose_kernel=True)

    def analysis(self, audio):
        return jnp.swapaxes(self.lt_in(jnp.swapaxes(audio, -1, -2)), -1, -2)

    def synthesis(self, h):
        return jnp.swapaxes(self.lt_out(jnp.swapaxes(h, -1, -2)), -1, -2)

    def __call__(self, audio):          # init path
        return self.synthesis(self.analysis(audio))


class MelE1d(nn.Module):
    """audio_encoders_pytorch MelE1d: log-mel front end -> Encoder1d tower
    -> tanh bottleneck (reference given_models.py:465-477). Latents at
    hop * prod(factors) audio rate (256*4 = /1024 at the DMAE config)."""
    in_channels: int = 2
    channels: int = 512
    multipliers: Sequence[int] = (1, 1, 1)
    factors: Sequence[int] = (2, 2)
    num_blocks: Sequence[int] = (4, 8)
    out_channels: int = 32
    mel_channels: int = 80
    sample_rate: int = 44100
    n_fft: int = 1024
    hop: int = 256

    def setup(self):
        self.tower = Encoder1d(
            in_channels=self.in_channels * self.mel_channels,
            out_channels=self.out_channels, channels=self.channels,
            multipliers=tuple(self.multipliers),
            factors=tuple(self.factors),
            num_blocks=tuple(self.num_blocks))

    def mel(self, audio):
        """(B, C, T) -> (B, C*mel, T/hop) log-mels. center=False with a
        reflect pre-pad of (win-hop)/2 — exactly T/hop frames, so the
        latent rate divides the audio rate (static-shape friendly)."""
        p = (self.n_fft - self.hop) // 2
        x = jnp.pad(audio, ((0, 0), (0, 0), (p, p)), mode="reflect")
        m = melspectrogram(x, self.sample_rate, self.n_fft, self.hop,
                           n_mels=self.mel_channels, center=False)
        m = jnp.log(jnp.clip(m, 1e-5, None))         # mel_normalize_log
        b = m.shape[0]
        return m.reshape(b, -1, m.shape[-1])          # (B, C*mel, F)

    def encode_mel(self, logmel):
        return jnp.tanh(self.tower(logmel))           # TanhBottleneck

    def __call__(self, audio):
        return self.encode_mel(self.mel(audio))


class DiffusionAE1d(nn.Module):
    """DiffusionAE: MelE1d latents injected into an LT-wrapped UNetV0
    v-diffusion decoder (reference given_models.py:455-478)."""
    in_channels: int = 2
    channels: Sequence[int] = (256, 512, 512, 512, 1024, 1024, 1024)
    factors: Sequence[int] = (1, 2, 2, 2, 2, 2, 2)
    items: Sequence[int] = (1, 2, 2, 2, 2, 2, 2)
    linear_attentions: Sequence[int] = (0, 1, 1, 1, 1, 1, 1)
    attention_features: int = 64
    attention_heads: int = 8
    inject_depth: int = 4
    latent_dim: int = 32
    resnet_groups: int = 8
    # LT plugin
    num_filters: int = 128
    window_length: int = 128
    lt_stride: int = 64
    # MelE1d
    enc_channels: int = 512
    enc_multipliers: Sequence[int] = (1, 1, 1)
    enc_factors: Sequence[int] = (2, 2)
    enc_num_blocks: Sequence[int] = (4, 8)
    n_mels: int = 80
    sample_rate: int = 44100
    mel_n_fft: int = 1024
    mel_hop: int = 256

    @property
    def downsampling_ratio(self) -> int:
        r = self.mel_hop
        for f in self.enc_factors:
            r *= f
        return r

    def setup(self):
        n = len(self.channels)
        # latent rate consistency: mel-encoder rate == inject-depth rate
        unet_rate = self.lt_stride
        for f in self.factors[:self.inject_depth + 1]:
            unet_rate *= f
        assert unet_rate == self.downsampling_ratio, \
            (unet_rate, self.downsampling_ratio)
        self.encoder = MelE1d(
            in_channels=self.in_channels, channels=self.enc_channels,
            multipliers=tuple(self.enc_multipliers),
            factors=tuple(self.enc_factors),
            num_blocks=tuple(self.enc_num_blocks),
            out_channels=self.latent_dim, mel_channels=self.n_mels,
            sample_rate=self.sample_rate, n_fft=self.mel_n_fft,
            hop=self.mel_hop)
        self.lt = LearnedTransform(
            num_filters=self.num_filters,
            window_length=self.window_length, stride=self.lt_stride,
            audio_channels=self.in_channels)
        ctx = [0] * n
        ctx[self.inject_depth] = self.latent_dim
        self.unet = UNetV0(
            in_channels=self.num_filters,
            channels=tuple(self.channels), factors=tuple(self.factors),
            items=tuple(self.items),
            linear_attentions=tuple(self.linear_attentions),
            context_channels=tuple(ctx),
            attention_features=self.attention_features,
            attention_heads=self.attention_heads,
            resnet_groups=self.resnet_groups)

    def encode(self, audio):
        """(B, C, T) -> (B, latent_dim, T/downsampling_ratio) in [-1, 1]."""
        return self.encoder(audio)

    def decode_v(self, x, t, latent):
        """One v-diffusion step on audio x: LT analysis -> UNetV0 (latent
        injected at inject_depth) -> LT synthesis."""
        h = self.lt.analysis(x)
        v = self.unet(h, t, context=latent)
        return self.lt.synthesis(v)

    def __call__(self, audio, t):
        z = self.encode(audio)
        return self.decode_v(audio, t, z)
