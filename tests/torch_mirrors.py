"""Vendored torch mirrors of the reference's external model zoo.

The reference loads pretrained torch checkpoints for models whose source
lives in external packages not present in this image (zqevans
audio-diffusion's SoundStreamXLEncoder / DiffusionAttnUnet1D /
AudioAutoencoder, archinet's Encoder1d — see reference
DiffusionDVAE.py:98-160, StackedAELatentDiffusionCond.py:177-255). These
mirrors re-create those architectures in torch with the REAL state-dict
layout (module nesting and naming: `encoder.layers.*`, `diffusion.net.*`
SkipBlock nests, `*_ema` twins) so tests/test_convert_parity.py can
certify the torch->flax converters numerically: random-init mirror ->
state_dict() -> convert -> flax forward must equal the torch forward.

Numerics follow the flax rebuild's choices where the ecosystems diverge
(tanh-approx GELU matching flax nn.gelu's default, zero padding in the
fixed-kernel resamplers, GroupNorm eps 1e-6, nearest-neighbour cond
upsampling): these sub-1e-3 boundary/approximation details don't affect
the state-dict layout the conversion certification targets. Written from
the architecture descriptions, not copied from any package.
"""
from __future__ import annotations

import math
from copy import deepcopy

import torch
import torch.nn.functional as F
from torch import nn


class GELU(nn.Module):
    """tanh-approx GELU (flax nn.gelu default)."""
    def forward(self, x):  # noqa: D102
        return F.gelu(x, approximate="tanh")


class FourierFeatures(nn.Module):
    def __init__(self, in_features: int, out_features: int, std: float = 1.0):
        super().__init__()
        self.weight = nn.Parameter(
            torch.randn([out_features // 2, in_features]) * std)

    def forward(self, x):
        f = 2 * math.pi * x @ self.weight.T
        return torch.cat([f.cos(), f.sin()], dim=-1)


class ResidualBlock(nn.Module):
    def __init__(self, main, skip=None):
        super().__init__()
        self.main = nn.Sequential(*main)
        self.skip = skip if skip else nn.Identity()

    def forward(self, x):
        return self.main(x) + self.skip(x)


class ResConvBlock(ResidualBlock):
    def __init__(self, c_in: int, c_mid: int, c_out: int,
                 is_last: bool = False):
        skip = None if c_in == c_out \
            else nn.Conv1d(c_in, c_out, 1, bias=False)
        super().__init__([
            nn.Conv1d(c_in, c_mid, 5, padding=2),
            nn.GroupNorm(1, c_mid, eps=1e-6),
            GELU(),
            nn.Conv1d(c_mid, c_out, 5, padding=2),
            nn.GroupNorm(1, c_out, eps=1e-6) if not is_last else nn.Identity(),
            GELU() if not is_last else nn.Identity(),
        ], skip)


class SelfAttention1d(nn.Module):
    def __init__(self, c_in: int, n_head: int = 1):
        super().__init__()
        assert c_in % n_head == 0
        self.norm = nn.GroupNorm(1, c_in, eps=1e-6)
        self.n_head = n_head
        self.qkv_proj = nn.Conv1d(c_in, c_in * 3, 1)
        self.out_proj = nn.Conv1d(c_in, c_in, 1)

    def forward(self, x):
        n, c, s = x.shape
        qkv = self.qkv_proj(self.norm(x))
        qkv = qkv.view([n, self.n_head * 3, c // self.n_head, s]).transpose(2, 3)
        q, k, v = qkv.chunk(3, dim=1)
        scale = (c // self.n_head) ** -0.25
        att = ((q * scale) @ (k * scale).transpose(2, 3)).softmax(3)
        y = (att @ v).transpose(2, 3).contiguous().view([n, c, s])
        return x + self.out_proj(y)


class Downsample1d(nn.Module):
    """x2 via fixed [1,3,3,1]/8 smoothing, zero-padded (flax parity)."""
    def __init__(self):
        super().__init__()
        self.register_buffer("kernel_1d",
                             torch.tensor([1.0, 3.0, 3.0, 1.0]) / 8.0)

    def forward(self, x):
        c = x.shape[1]
        w = self.kernel_1d.to(x.dtype)[None, None, :].expand(c, 1, 4)
        return F.conv1d(x, w, stride=2, padding=1, groups=c)


class Upsample1d(nn.Module):
    """x2 linear upsample via transposed depthwise conv (flax parity)."""
    def __init__(self):
        super().__init__()
        self.register_buffer("kernel_1d",
                             torch.tensor([1.0, 3.0, 3.0, 1.0]) / 4.0)

    def forward(self, x):
        c = x.shape[1]
        w = self.kernel_1d.to(x.dtype)[None, None, :].expand(c, 1, 4)
        return F.conv_transpose1d(x, w.reshape(c, 1, 4), stride=2,
                                  padding=1, groups=c)


class SkipBlock(nn.Module):
    def __init__(self, *main):
        super().__init__()
        self.main = nn.Sequential(*main)

    def forward(self, x):
        return torch.cat([self.main(x), x], dim=1)


class DiffusionAttnUnet1D(nn.Module):
    """Recursive SkipBlock UNet (dance-diffusion lineage): every level is
    [Down, conv x3 (+attn), inner, conv x3 (+attn), Up] wrapped in a skip
    concat cat([main(x), x]); the outermost level has no resampling and its
    last conv is the is_last io head."""
    def __init__(self, io_channels=2, cond_dim=0, n_attn_layers=4,
                 c_mults=(256, 256) + (512,) * 12, depth=None,
                 pqmf_bands=1):
        super().__init__()
        depth = depth or len(c_mults)
        c_mults = list(c_mults)[:depth]
        n_io = io_channels * pqmf_bands
        attn_start = depth - n_attn_layers
        self.io_channels, self.cond_dim = io_channels, cond_dim
        self.timestep_embed = FourierFeatures(1, 16)

        block = None
        for i in range(depth, 0, -1):
            j = i - 1                       # flax level index
            c = c_mults[j]
            add_attn = j >= attn_start and n_attn_layers > 0

            def A(ch, _a=add_attn):
                return SelfAttention1d(ch, max(1, ch // 32)) if _a \
                    else nn.Identity()

            if i > 1:
                c_prev = c_mults[j - 1]
                block = SkipBlock(
                    Downsample1d(),
                    ResConvBlock(c_prev, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    block if block is not None else nn.Identity(),
                    ResConvBlock(c * 2 if i != depth else c, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    ResConvBlock(c, c, c_prev), A(c_prev),
                    Upsample1d(),
                )
            else:
                n_in = n_io + 16 + cond_dim
                block = nn.Sequential(
                    ResConvBlock(n_in, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    block,
                    ResConvBlock(c * 2, c, c), A(c),
                    ResConvBlock(c, c, c), A(c),
                    ResConvBlock(c, c, n_io, is_last=True),
                )
        self.net = block

    def forward(self, x, t, cond=None):
        te = self.timestep_embed(t[:, None])
        te = te[:, :, None].expand(-1, -1, x.shape[2])
        ins = [x, te]
        if self.cond_dim > 0:
            ins.append(F.interpolate(cond, size=x.shape[2], mode="nearest"))
        return self.net(torch.cat(ins, dim=1))


# ----------------------------------------------------------- SoundStream ---

class ResidualUnit(nn.Module):
    def __init__(self, ch: int, dilation: int):
        super().__init__()
        self.layers = nn.Sequential(
            nn.ELU(),
            nn.Conv1d(ch, ch, 7, dilation=dilation, padding=3 * dilation),
            nn.ELU(),
            nn.Conv1d(ch, ch, 1),
        )

    def forward(self, x):
        return x + self.layers(x)


class EncoderBlock(nn.Module):
    def __init__(self, in_channels: int, out_channels: int, stride: int):
        super().__init__()
        self.layers = nn.Sequential(
            ResidualUnit(in_channels, 1),
            ResidualUnit(in_channels, 3),
            ResidualUnit(in_channels, 9),
            nn.ELU(),
            nn.Conv1d(in_channels, out_channels, 2 * stride, stride=stride,
                      padding=stride // 2),
        )

    def forward(self, x):
        return self.layers(x)


class DecoderBlock(nn.Module):
    def __init__(self, in_channels: int, out_channels: int, stride: int):
        super().__init__()
        self.layers = nn.Sequential(
            nn.ELU(),
            nn.ConvTranspose1d(in_channels, out_channels, 2 * stride,
                               stride=stride, padding=stride // 2),
            ResidualUnit(out_channels, 1),
            ResidualUnit(out_channels, 3),
            ResidualUnit(out_channels, 9),
        )

    def forward(self, x):
        return self.layers(x)


class SoundStreamXLEncoder(nn.Module):
    def __init__(self, in_channels=2, capacity=32, latent_dim=64,
                 c_mults=(2, 4, 8, 16, 32), strides=(4, 4, 2, 2, 2)):
        super().__init__()
        layers = [nn.Conv1d(in_channels, capacity, 7, padding=3)]
        prev = capacity
        for mult, stride in zip(c_mults, strides):
            layers.append(EncoderBlock(prev, capacity * mult, stride))
            prev = capacity * mult
        layers += [nn.ELU(), nn.Conv1d(prev, latent_dim, 3, padding=1)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class SoundStreamXLDecoder(nn.Module):
    def __init__(self, out_channels=2, capacity=32, latent_dim=64,
                 c_mults=(2, 4, 8, 16, 32), strides=(2, 2, 2, 2, 2)):
        super().__init__()
        layers = [nn.Conv1d(latent_dim, capacity * c_mults[-1], 7, padding=3)]
        prev = capacity * c_mults[-1]
        for mult_next, stride in zip(
                list(c_mults[-2::-1]) + [1], list(strides)[::-1]):
            layers.append(DecoderBlock(prev, capacity * mult_next, stride))
            prev = capacity * mult_next
        layers += [nn.ELU(), nn.Conv1d(prev, out_channels, 7, padding=3)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class AudioAutoencoder(nn.Module):
    """First-stage waveform AE (reference given_models.py:373,
    StackedAELatentDiffusionCond.py:215-217)."""
    def __init__(self, capacity=64, c_mults=(2, 4, 8, 16, 32),
                 strides=(2, 2, 2, 2, 2), latent_dim=32, io_channels=2):
        super().__init__()
        self.encoder = SoundStreamXLEncoder(
            in_channels=io_channels, capacity=capacity,
            latent_dim=latent_dim, c_mults=c_mults, strides=strides)
        self.decoder = SoundStreamXLDecoder(
            out_channels=io_channels, capacity=capacity,
            latent_dim=latent_dim, c_mults=c_mults, strides=strides)

    def encode(self, audio):
        return torch.tanh(self.encoder(audio))

    def decode(self, latents):
        return self.decoder(latents)


# -------------------------------------------------------------- Encoder1d ---

class ResnetBlock1d(nn.Module):
    def __init__(self, c_in: int, c_out: int):
        super().__init__()
        self.block = nn.Sequential(
            nn.GroupNorm(8, c_in, eps=1e-6),
            nn.SiLU(),
            nn.Conv1d(c_in, c_out, 3, padding=1),
            nn.GroupNorm(8, c_out, eps=1e-6),
            nn.SiLU(),
            nn.Conv1d(c_out, c_out, 3, padding=1),
        )
        self.skip = nn.Conv1d(c_in, c_out, 1, bias=False) \
            if c_in != c_out else nn.Identity()

    def forward(self, x):
        return self.skip(x) + self.block(x)


class Encoder1d(nn.Module):
    def __init__(self, in_channels=32, out_channels=32, channels=128,
                 multipliers=(1, 2, 4, 8, 8), factors=(2, 2, 2, 2),
                 num_blocks=(8, 8, 8, 8)):
        super().__init__()
        layers = [nn.Conv1d(in_channels, channels * multipliers[0], 7,
                            padding=3)]
        for i, (factor, blocks) in enumerate(zip(factors, num_blocks)):
            feats = channels * multipliers[i]
            layers += [ResnetBlock1d(feats, feats) for _ in range(blocks)]
            layers.append(nn.Conv1d(feats, channels * multipliers[i + 1],
                                    2 * factor, stride=factor,
                                    padding=factor // 2))
        layers += [nn.GroupNorm(8, channels * multipliers[-1], eps=1e-6),
                   nn.SiLU(),
                   nn.Conv1d(channels * multipliers[-1], out_channels, 3,
                             padding=1)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


# ------------------------------------------------------------ top modules ---

class DiffusionDVAE(nn.Module):
    """Reference DiffusionDVAE.py:98-160 (sans PQMF/quantizer options)."""
    def __init__(self, latent_dim=64, capacity=32, c_mults=(2, 4, 8, 16, 32),
                 strides=(4, 4, 2, 2, 2), n_attn_layers=4,
                 diffusion_c_mults=(256, 256) + (512,) * 12):
        super().__init__()
        self.encoder = SoundStreamXLEncoder(
            in_channels=2, capacity=capacity, latent_dim=latent_dim,
            c_mults=c_mults, strides=strides)
        self.encoder_ema = deepcopy(self.encoder)
        self.diffusion = DiffusionAttnUnet1D(
            io_channels=2, cond_dim=latent_dim,
            n_attn_layers=n_attn_layers, c_mults=diffusion_c_mults)
        self.diffusion_ema = deepcopy(self.diffusion)


class LatentAudioDiffusionAutoencoder(nn.Module):
    """Reference StackedAELatentDiffusionCond.py:177-255."""
    def __init__(self, latent_dim=32, second_stage_latent_dim=32,
                 factors=(2, 2, 2, 2), ae_capacity=64,
                 ae_c_mults=(2, 4, 8, 16, 32), ae_strides=(2, 2, 2, 2, 2),
                 latent_channels=128, latent_multipliers=(1, 2, 4, 8, 8),
                 latent_num_blocks=(8, 8, 8, 8),
                 diffusion_c_mults=(512,) * 10, diffusion_depth=10):
        super().__init__()
        self.latent_encoder = Encoder1d(
            in_channels=latent_dim, out_channels=second_stage_latent_dim,
            channels=latent_channels, multipliers=latent_multipliers,
            factors=factors, num_blocks=latent_num_blocks)
        self.latent_encoder_ema = deepcopy(self.latent_encoder)
        self.diffusion = DiffusionAttnUnet1D(
            io_channels=latent_dim, cond_dim=second_stage_latent_dim,
            n_attn_layers=0, c_mults=diffusion_c_mults,
            depth=diffusion_depth)
        self.diffusion_ema = deepcopy(self.diffusion)
        self.autoencoder = AudioAutoencoder(
            capacity=ae_capacity, c_mults=ae_c_mults, strides=ae_strides,
            latent_dim=latent_dim)

    def encode(self, reals):
        first = self.autoencoder.encode(reals)
        return torch.tanh(self.latent_encoder_ema(first))


# ----------------------------------------------------------- RAVE v2 mirror

def _wn(module):
    """RAVE's normalization() — torch weight_norm (v2.gin mode
    'weight_norm'), so mirror state dicts carry weight_g/weight_v pairs
    the converter must fuse."""
    return torch.nn.utils.weight_norm(module)


class RaveDilatedUnit(nn.Module):
    def __init__(self, dim: int, kernel_size: int, dilation: int):
        super().__init__()
        self.net = nn.Sequential(
            nn.LeakyReLU(0.2),
            _wn(nn.Conv1d(dim, dim, kernel_size, dilation=dilation,
                          padding=dilation * (kernel_size // 2))),
            nn.LeakyReLU(0.2),
            _wn(nn.Conv1d(dim, dim, 1)),
        )

    def forward(self, x):
        return x + self.net(x)


class RaveEncoderV2(nn.Module):
    def __init__(self, data_size, capacity, ratios, latent_size, dilations,
                 n_out=2, kernel_size=3):
        super().__init__()
        net = [_wn(nn.Conv1d(data_size, capacity, 2 * kernel_size + 1,
                             padding=kernel_size))]
        ch = capacity
        for r, dils in zip(ratios, dilations):
            for d in dils:
                net.append(RaveDilatedUnit(ch, kernel_size, d))
            net.append(nn.LeakyReLU(0.2))
            net.append(_wn(nn.Conv1d(ch, 2 * ch, 2 * r, stride=r,
                                     padding=r // 2)))
            ch *= 2
        net += [nn.LeakyReLU(0.2),
                _wn(nn.Conv1d(ch, n_out * latent_size, 2 * kernel_size + 1,
                              padding=kernel_size))]
        self.net = nn.Sequential(*net)

    def forward(self, x):
        return self.net(x)


def _amp_to_ir_torch(amp, target_size: int):
    ir = torch.fft.irfft(torch.complex(amp, torch.zeros_like(amp)))
    fs = ir.shape[-1]
    ir = torch.roll(ir, fs // 2, -1)
    n = torch.arange(fs, dtype=ir.dtype)
    win = 0.5 - 0.5 * torch.cos(2 * math.pi * n / fs)  # periodic Hann
    ir = ir * win
    ir = F.pad(ir, (0, int(target_size) - fs))
    return torch.roll(ir, -(fs // 2), -1)


def _fft_convolve_torch(signal, kernel):
    n = signal.shape[-1]
    sig = F.pad(signal, (0, n))
    ker = F.pad(kernel, (n, 0))
    out = torch.fft.irfft(torch.fft.rfft(sig) * torch.fft.rfft(ker))
    return out[..., out.shape[-1] // 2:]


def _mod_sigmoid(x):
    return 2.0 * torch.sigmoid(x) ** 2.3 + 1e-7


class _SamePad1d(nn.Module):
    """Replicates XLA SAME padding (possibly asymmetric, low-half first)
    so the mirror's strided k=3 noise convs align bit-for-bit with the
    flax side — padding is a forward convention, not a state-dict
    property, so this costs the pour nothing."""
    def __init__(self, kernel_size: int, stride: int):
        super().__init__()
        self.k, self.s = kernel_size, stride

    def forward(self, x):
        t = x.shape[-1]
        out = -(-t // self.s)
        total = max((out - 1) * self.s + self.k - t, 0)
        return F.pad(x, (total // 2, total - total // 2))


class RaveNoiseGenerator(nn.Module):
    def __init__(self, in_size, data_size, ratios=(4, 4, 4), noise_bands=5):
        super().__init__()
        chans = [in_size] * len(ratios) + [data_size * noise_bands]
        net = []
        for i, r in enumerate(ratios):
            net.append(_SamePad1d(3, r))
            net.append(_wn(nn.Conv1d(chans[i], chans[i + 1], 3, stride=r)))
            if i != len(ratios) - 1:
                net.append(nn.LeakyReLU(0.2))
        self.net = nn.Sequential(*net)
        self.data_size = data_size
        self.target_size = math.prod(ratios)

    def forward(self, x, noise=None):
        amp = _mod_sigmoid(self.net(x) - 5.0)
        amp = amp.permute(0, 2, 1)
        b, tn, _ = amp.shape
        amp = amp.reshape(b, tn, self.data_size, -1)
        ir = _amp_to_ir_torch(amp, self.target_size)
        if noise is None:
            noise = torch.rand_like(ir) * 2 - 1
        out = _fft_convolve_torch(noise, ir).permute(0, 2, 1, 3)
        return out.reshape(b, self.data_size, -1)


class RaveGeneratorV2(nn.Module):
    def __init__(self, data_size, capacity, ratios, latent_size, dilations,
                 kernel_size=3, amplitude_modulation=True, use_noise=True,
                 noise_ratios=(4, 4, 4), noise_bands=5):
        super().__init__()
        ch = capacity * 2 ** len(ratios)
        net = [_wn(nn.Conv1d(latent_size, ch, 2 * kernel_size + 1,
                             padding=kernel_size))]
        for r, dils in zip(ratios[::-1], dilations[::-1]):
            net.append(nn.LeakyReLU(0.2))
            net.append(_wn(nn.ConvTranspose1d(ch, ch // 2, 2 * r, stride=r,
                                              padding=r // 2)))
            ch //= 2
            for d in dils:
                net.append(RaveDilatedUnit(ch, kernel_size, d))
        self.net = nn.Sequential(*net)
        self.amplitude_modulation = amplitude_modulation
        self.use_noise = use_noise
        self.waveform_module = _wn(nn.Conv1d(
            ch, 2 * data_size if amplitude_modulation else data_size,
            2 * kernel_size + 1, padding=kernel_size))
        if use_noise:
            self.noise_module = RaveNoiseGenerator(
                ch, data_size, ratios=noise_ratios, noise_bands=noise_bands)

    def forward(self, z, noise=None):
        x = self.net(z)
        wav = self.waveform_module(F.leaky_relu(x, 0.2))
        if self.amplitude_modulation:
            wav, amp = wav.chunk(2, dim=1)
            wav = wav * _mod_sigmoid(amp)
        bands = torch.tanh(wav)
        if self.use_noise:
            bands = bands + self.noise_module(x, noise=noise)
        return bands


class RaveV2(nn.Module):
    """Band-level RAVE v2 (PQMF front-end lives outside: the real model's
    pqmf filters are buffers the converter skips)."""
    def __init__(self, data_size=16, capacity=64, ratios=(4, 4, 4, 2),
                 latent_size=128, kernel_size=3, dilations=None,
                 noise_ratios=(4, 4, 4), noise_bands=5,
                 amplitude_modulation=True, use_noise=True):
        super().__init__()
        dils = tuple(dilations) if dilations is not None \
            else tuple((1, 3, 9) for _ in ratios)

        class _Variational(nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.encoder = inner

            def forward(self, x):
                return self.encoder(x)

        self.encoder = _Variational(RaveEncoderV2(
            data_size, capacity, ratios, latent_size, dils,
            n_out=2, kernel_size=kernel_size))
        self.decoder = RaveGeneratorV2(
            data_size, capacity, ratios, latent_size, dils,
            kernel_size=kernel_size,
            amplitude_modulation=amplitude_modulation, use_noise=use_noise,
            noise_ratios=noise_ratios, noise_bands=noise_bands)

    def encode_bands(self, bands):
        mean, _scale = self.encoder(bands).chunk(2, dim=1)
        return mean

    def decode_bands(self, z, noise=None):
        return self.decoder(z, noise=noise)


# ------------------------------------------------------------- UNetCFG1d ---
# The MIRAGE inner model (archinet audio_diffusion_pytorch 0.0.97's
# UNetCFG1d, reference StackedAELatentDiffusionCond.py:297-317). That
# package is not in this image and the reference does not vendor the
# module source, so unlike the mirrors above this one cannot reproduce
# archinet's exact attribute naming; it mirrors the RERBUILT architecture's
# structure under real-checkpoint-style top-level naming (`diffusion.*`,
# ema_pytorch's `diffusion_ema.{online_model,ema_model}.*`). What the
# parity test certifies: the converter's kind-aware ordered pour, weight
# orientations (incl. the torch-semantics ConvTranspose up path), the EMA
# remap, and that the shape-degenerate attention stack (dozens of
# same-shaped Dense) pairs without crossing tensors.

class _CfgConv1d(nn.Conv1d):
    """nn.Conv1d with XLA SAME padding (asymmetric, low-half first)."""

    def __init__(self, c_in, c_out, k, stride=1):
        super().__init__(c_in, c_out, k, stride=stride)

    def forward(self, x):
        t = x.shape[-1]
        out = -(-t // self.stride[0])
        total = max((out - 1) * self.stride[0] + self.kernel_size[0] - t, 0)
        x = F.pad(x, (total // 2, total - total // 2))
        return self._conv_forward(x, self.weight, self.bias)


class _GNFilmSilu(nn.Module):
    """GroupNorm(eps 1e-6) -> optional FiLM -> optional SiLU, channels-
    first; mirrors GroupNormFoldable (unet_cfg1d.py:152)."""

    def __init__(self, groups, c):
        super().__init__()
        self.gn = nn.GroupNorm(groups, c, eps=1e-6)

    def forward(self, x, film_scale=None, film_shift=None, silu=True):
        h = self.gn(x)
        if film_scale is not None:
            h = h * (1 + film_scale)
        if film_shift is not None:
            h = h + film_shift
        return F.silu(h) if silu else h


class CfgResnetBlock(nn.Module):
    """Mirrors unet_cfg1d.ResnetBlock: GN-silu-conv3, time FiLM,
    GN-film-silu-conv3, projected skip."""

    def __init__(self, c_in, features, groups, time_features):
        super().__init__()
        self.GroupNorm_0 = _GNFilmSilu(groups, c_in)
        self.Conv1d_0 = _CfgConv1d(c_in, features, 3)
        self.Dense_0 = nn.Linear(time_features, 2 * features)
        self.GroupNorm_1 = _GNFilmSilu(groups, features)
        self.Conv1d_1 = _CfgConv1d(features, features, 3)
        self.Dense_1 = (nn.Linear(c_in, features, bias=False)
                        if c_in != features else None)

    def forward(self, x, time_emb):
        h = self.Conv1d_0(self.GroupNorm_0(x))
        ts = self.Dense_0(F.silu(time_emb))          # (B, 2F)
        scale, shift = ts.unsqueeze(-1).chunk(2, dim=1)
        h = self.Conv1d_1(self.GroupNorm_1(h, scale, shift))
        skip = x if self.Dense_1 is None else \
            self.Dense_1(x.transpose(1, 2)).transpose(1, 2)
        return skip + h


def _t5_bucket(rel_pos, num_buckets, max_distance):
    num_buckets //= 2
    ret = torch.where(rel_pos > 0, num_buckets, 0)
    n = rel_pos.abs()
    max_exact = num_buckets // 2
    val_if_large = max_exact + (
        torch.log(n.clamp(min=1).float() / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).long()
    val_if_large = val_if_large.clamp(max=num_buckets - 1)
    return ret + torch.where(n < max_exact, n, val_if_large)


class CfgSelfAttention(nn.Module):
    """Rel-pos self-attention (naive (T,T) bucket gather — the mirror
    doesn't need the skew trick, only the same math)."""

    def __init__(self, c, heads, head_features, num_buckets, max_distance):
        super().__init__()
        inner = heads * head_features
        self.heads, self.hf = heads, head_features
        self.nb, self.md = num_buckets, max_distance
        self.LayerNorm_0 = nn.LayerNorm(c, eps=1e-6)
        self.Dense_0 = nn.Linear(c, inner, bias=False)
        self.Dense_1 = nn.Linear(c, inner, bias=False)
        self.Dense_2 = nn.Linear(c, inner, bias=False)
        self.rel_pos_bias = nn.Parameter(0.02 * torch.randn(num_buckets,
                                                            heads))
        self.Dense_3 = nn.Linear(inner, c)

    def forward(self, x):                            # x: (B, T, C)
        b, t, c = x.shape
        h = self.LayerNorm_0(x)
        q = self.Dense_0(h).view(b, t, self.heads, self.hf)
        k = self.Dense_1(h).view(b, t, self.heads, self.hf)
        v = self.Dense_2(h).view(b, t, self.heads, self.hf)
        att = torch.einsum("bthd,bshd->bhts", q * self.hf ** -0.5, k)
        pos = torch.arange(t)
        bias = self.rel_pos_bias[
            _t5_bucket(pos[None, :] - pos[:, None], self.nb, self.md)]
        att = att + bias.permute(2, 0, 1)[None]
        y = torch.einsum("bhts,bshd->bthd", att.softmax(-1), v)
        return x + self.Dense_3(y.reshape(b, t, -1))


class CfgCrossAttention(nn.Module):
    def __init__(self, c, ctx_features, heads, head_features):
        super().__init__()
        inner = heads * head_features
        self.heads, self.hf = heads, head_features
        self.LayerNorm_0 = nn.LayerNorm(c, eps=1e-6)
        self.LayerNorm_1 = nn.LayerNorm(ctx_features, eps=1e-6)
        self.Dense_0 = nn.Linear(c, inner, bias=False)
        self.Dense_1 = nn.Linear(ctx_features, inner, bias=False)
        self.Dense_2 = nn.Linear(ctx_features, inner, bias=False)
        self.Dense_3 = nn.Linear(inner, c)

    def forward(self, x, context):
        b, t, c = x.shape
        h = self.LayerNorm_0(x)
        ctx = self.LayerNorm_1(context)
        q = self.Dense_0(h).view(b, t, self.heads, self.hf)
        k = self.Dense_1(ctx).view(b, -1, self.heads, self.hf)
        v = self.Dense_2(ctx).view(b, -1, self.heads, self.hf)
        att = torch.einsum("bthd,bshd->bhts", q * self.hf ** -0.5, k)
        y = torch.einsum("bhts,bshd->bthd", att.softmax(-1), v)
        return x + self.Dense_3(y.reshape(b, t, -1))


class CfgFeedForward(nn.Module):
    def __init__(self, c, multiplier):
        super().__init__()
        self.LayerNorm_0 = nn.LayerNorm(c, eps=1e-6)
        self.Dense_0 = nn.Linear(c, c * multiplier)
        self.Dense_1 = nn.Linear(c * multiplier, c)

    def forward(self, x):
        return x + self.Dense_1(
            F.gelu(self.Dense_0(self.LayerNorm_0(x)), approximate="tanh"))


class CfgTransformerBlock(nn.Module):
    def __init__(self, c, ctx_features, heads, head_features, multiplier,
                 num_buckets, max_distance):
        super().__init__()
        self.RelPosSelfAttention_0 = CfgSelfAttention(
            c, heads, head_features, num_buckets, max_distance)
        self.CrossAttention_0 = CfgCrossAttention(
            c, ctx_features, heads, head_features)
        self.FeedForward_0 = CfgFeedForward(c, multiplier)

    def forward(self, x, context):                   # (B, T, C)
        x = self.RelPosSelfAttention_0(x)
        x = self.CrossAttention_0(x, context)
        return self.FeedForward_0(x)


class _CfgCore(nn.Module):
    """Mirrors unet_cfg1d._UNetCore (same module names, same flow)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch, mults = cfg["channels"], cfg["multipliers"]
        n_levels = len(mults)
        tf = 4 * ch
        self.time_mlp1 = nn.Linear(ch, tf)
        self.time_mlp2 = nn.Linear(tf, tf)
        self.init_conv = _CfgConv1d(cfg["in_channels"], ch * mults[0], 7)

        def add_level(c_in, i, stage):
            feats = ch * mults[i]
            nb = cfg["num_blocks"]
            for j in range(nb[i] if i < len(nb) else 1):
                setattr(self, f"{stage}_res{i}_{j}",
                        CfgResnetBlock(c_in, feats, cfg["resnet_groups"], tf))
                c_in = feats
            for j in range(cfg["attentions"][i]):
                setattr(self, f"{stage}_attn{i}_{j}", CfgTransformerBlock(
                    feats, cfg["context_embedding_features"],
                    cfg["attention_heads"], cfg["attention_features"],
                    cfg["attention_multiplier"],
                    cfg["attention_rel_pos_num_buckets"],
                    cfg["attention_rel_pos_max_distance"]))
            return feats

        c = ch * mults[0]
        for i in range(n_levels - 1):
            c = add_level(c, i, "down")
            f = cfg["factors"][i]
            k = f * cfg["kernel_multiplier_downsample"] if f > 1 else 3
            setattr(self, f"down_conv{i}",
                    _CfgConv1d(c, ch * mults[i + 1], k, stride=f))
            c = ch * mults[i + 1]
        c = add_level(c, n_levels - 1, "mid")
        for i in reversed(range(n_levels - 1)):
            f = cfg["factors"][i]
            if f > 1:
                setattr(self, f"up_conv{i}", nn.ConvTranspose1d(
                    c, ch * mults[i],
                    f * cfg["kernel_multiplier_downsample"], stride=f,
                    padding=f // 2))
            else:
                setattr(self, f"up_conv{i}", _CfgConv1d(c, ch * mults[i], 3))
            c = add_level(ch * mults[i] * 2, i, "up")
        self.out_norm = _GNFilmSilu(cfg["resnet_groups"], c)
        self.out_conv = _CfgConv1d(c, cfg["in_channels"], 7)

    def _level(self, h, i, stage, time_emb, context):
        nb = self.cfg["num_blocks"]
        for j in range(nb[i] if i < len(nb) else 1):
            h = getattr(self, f"{stage}_res{i}_{j}")(h, time_emb)
        for j in range(self.cfg["attentions"][i]):
            h = getattr(self, f"{stage}_attn{i}_{j}")(
                h.transpose(1, 2), context).transpose(1, 2)
        return h

    def forward(self, x, t, context):                # x: (B, C, T)
        cfg = self.cfg
        ch = cfg["channels"]
        half = ch // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        ang = t[:, None] * freqs[None, :] * 1000.0
        emb = torch.cat([ang.cos(), ang.sin()], dim=-1)
        time_emb = self.time_mlp2(F.silu(self.time_mlp1(emb)))

        n_levels = len(cfg["multipliers"])
        h = self.init_conv(x)
        skips = []
        for i in range(n_levels - 1):
            h = self._level(h, i, "down", time_emb, context)
            skips.append(h)
            h = getattr(self, f"down_conv{i}")(h)
        h = self._level(h, n_levels - 1, "mid", time_emb, context)
        for i in reversed(range(n_levels - 1)):
            h = getattr(self, f"up_conv{i}")(h)
            skip = skips.pop()
            if cfg["use_skip_scale"]:
                skip = skip * 2.0 ** -0.5
            h = torch.cat([h, skip], dim=1)
            h = self._level(h, i, "up", time_emb, context)
        return self.out_conv(self.out_norm(h))


class TorchUNetCFG1d(nn.Module):
    def __init__(self, **cfg):
        super().__init__()
        defaults = dict(in_channels=32, context_embedding_features=512,
                        context_embedding_max_length=1, channels=256,
                        resnet_groups=8, kernel_multiplier_downsample=2,
                        multipliers=(2, 3, 4, 4, 4, 4),
                        factors=(1, 2, 2, 4, 4), num_blocks=(3,) * 5,
                        attentions=(0, 0, 2, 2, 2, 2), attention_heads=16,
                        attention_features=64, attention_multiplier=4,
                        attention_rel_pos_max_distance=2048,
                        attention_rel_pos_num_buckets=256,
                        use_skip_scale=True, use_context_time=True)
        defaults.update(cfg)
        self.cfg = defaults
        self.fixed_embedding = nn.Parameter(0.02 * torch.randn(
            defaults["context_embedding_max_length"],
            defaults["context_embedding_features"]))
        self.core = _CfgCore(defaults)

    def forward(self, x, t, embedding=None, embedding_scale: float = 1.0):
        b = x.shape[0]
        null_ctx = self.fixed_embedding[None].expand(
            b, *self.fixed_embedding.shape)
        if embedding is None:
            return self.core(x, t, null_ctx)
        if embedding_scale != 1.0:
            x2 = torch.cat([x, x], dim=0)
            t2 = torch.cat([t, t], dim=0)
            ctx2 = torch.cat([embedding, null_ctx], dim=0)
            v_cond, v_null = self.core(x2, t2, ctx2).chunk(2, dim=0)
            return v_null + embedding_scale * (v_cond - v_null)
        return self.core(x, t, embedding)


class _EmaPytorch(nn.Module):
    """ema_pytorch.EMA state-dict layout: the online model is registered
    (and serialised) under `.online_model.`, the averaged copy under
    `.ema_model.` (reference StackedAELatentDiffusionCond.py:319-325)."""

    def __init__(self, model):
        super().__init__()
        self.online_model = model
        self.ema_model = deepcopy(model)


class StackedAELatentDiffusionCondLDM(nn.Module):
    """Top-level layout of the MIRAGE LDM checkpoint: `diffusion` +
    `diffusion_ema` (ema_pytorch)."""

    def __init__(self, **cfg):
        super().__init__()
        self.diffusion = TorchUNetCFG1d(**cfg)
        self.diffusion_ema = _EmaPytorch(self.diffusion)


# ----------------------------------------------------- DMAE (DiffusionAE) ---
# Torch mirror of models/dmae.py's UNetV0 + LTPlugin + MelE1d rebuild
# (reference given_models.py:449-478). Module registration order follows the
# flax execution order and item-internal names match the flax auto-names, so
# the natural-sort + kind-aware shape pour pairs deterministically.


class _DmaeResnetItem(nn.Module):
    def __init__(self, c_in, c_out, groups=8):
        super().__init__()
        self.GroupNorm_0 = nn.GroupNorm(groups, c_in, eps=1e-6)
        self.Conv1d_0 = nn.Conv1d(c_in, c_out, 3, padding=1)
        self.GroupNorm_1 = nn.GroupNorm(groups, c_out, eps=1e-6)
        self.Conv1d_1 = nn.Conv1d(c_out, c_out, 3, padding=1)
        self.Conv1d_2 = nn.Conv1d(c_in, c_out, 1, bias=False) \
            if c_in != c_out else nn.Identity()

    def forward(self, x):
        h = self.Conv1d_0(F.silu(self.GroupNorm_0(x)))
        h = self.Conv1d_1(F.silu(self.GroupNorm_1(h)))
        return self.Conv1d_2(x) + h


class _DmaeModulationItem(nn.Module):
    def __init__(self, c, modulation_features, groups=8):
        super().__init__()
        self.Dense_0 = nn.Linear(modulation_features, 2 * c)
        self.norm = nn.GroupNorm(groups, c, eps=1e-6, affine=False)

    def forward(self, x, emb):
        s, b = self.Dense_0(F.silu(emb)).chunk(2, dim=-1)
        return self.norm(x) * (1 + s[:, :, None]) + b[:, :, None]


class _DmaeInjectItem(nn.Module):
    def __init__(self, c, ctx_channels):
        super().__init__()
        self.Conv1d_0 = nn.Conv1d(c + ctx_channels, c, 1)

    def forward(self, x, ctx):
        return self.Conv1d_0(torch.cat([x, ctx], dim=1))


class _DmaeLinearAttentionItem(nn.Module):
    def __init__(self, c, heads, head_features):
        super().__init__()
        self.heads, self.head_features = heads, head_features
        inner = heads * head_features
        self.GroupNorm_0 = nn.GroupNorm(1, c, eps=1e-6)
        self.to_q = nn.Linear(c, inner, bias=False)
        self.to_k = nn.Linear(c, inner, bias=False)
        self.to_v = nn.Linear(c, inner, bias=False)
        self.to_out = nn.Linear(inner, c)

    def forward(self, x):
        b, c, t = x.shape
        hd, nh = self.head_features, self.heads
        h = self.GroupNorm_0(x).transpose(1, 2)            # (B, T, C)
        q = self.to_q(h).view(b, t, nh, hd)
        k = self.to_k(h).view(b, t, nh, hd)
        v = self.to_v(h).view(b, t, nh, hd)
        q = q.float().softmax(dim=-1) * hd ** -0.5
        k = k.float().softmax(dim=1)
        ctx = torch.einsum("bshd,bshe->bhde", k, v.float())
        y = torch.einsum("bthd,bhde->bthe", q, ctx).to(x.dtype)
        y = self.to_out(y.reshape(b, t, nh * hd))
        return x + y.transpose(1, 2)


class TorchUNetV0(nn.Module):
    """Mirror of models/dmae.UNetV0: down [conv2f/f + items]*, up
    [(cat skip) + items + convT]* with the latent injected at the
    context_channels level, AdaGN time modulation from a shared
    1024-d embedding."""

    def __init__(self, in_channels, channels, factors, items,
                 linear_attentions, context_channels,
                 attention_features=64, attention_heads=8,
                 resnet_groups=8, modulation_features=1024,
                 out_channels=None):
        super().__init__()
        self.time_ff = FourierFeatures(1, 256)
        self.time_mlp_0 = nn.Linear(256, modulation_features)
        self.time_mlp_1 = nn.Linear(modulation_features, modulation_features)
        n = len(channels)
        self._idx = 0
        plan = []

        def add(mod):
            name = f"n{self._idx:03d}"
            self.add_module(name, mod)
            self._idx += 1
            return name

        def level_items(i, c_in_first):
            c = channels[i]
            out = []
            for r in range(items[i]):
                out.append(("res", add(_DmaeResnetItem(
                    c_in_first if r == 0 else c, c, resnet_groups))))
                out.append(("mod", add(_DmaeModulationItem(
                    c, modulation_features, resnet_groups))))
                if context_channels[i]:
                    out.append(("inj", add(_DmaeInjectItem(
                        c, context_channels[i]))))
                for _ in range(linear_attentions[i]):
                    out.append(("att", add(_DmaeLinearAttentionItem(
                        c, attention_heads, attention_features))))
            return out

        prev = in_channels
        for i in range(n):                       # down
            f, c = factors[i], channels[i]
            plan.append(("op", add(
                nn.Conv1d(prev, c, 2 * f if f > 1 else 1, stride=f,
                          padding=(f // 2 if f > 1 else 0)))))
            prev = c
            plan += level_items(i, c)
            if i < n - 1:
                plan.append(("push", None))
        for i in reversed(range(n)):             # up
            f, c = factors[i], channels[i]
            if i < n - 1:
                plan.append(("cat", None))
            plan += level_items(i, 2 * c if i < n - 1 else c)
            c_out = (out_channels or in_channels) if i == 0 \
                else channels[i - 1]
            if f > 1:
                plan.append(("op", add(nn.ConvTranspose1d(
                    c, c_out, 2 * f, stride=f, padding=f // 2))))
            else:
                plan.append(("op", add(nn.Conv1d(c, c_out, 1))))
        self.plan = plan

    def forward(self, x, t, context=None):
        emb = self.time_mlp_1(F.silu(self.time_mlp_0(
            self.time_ff(t[:, None]))))
        skips, h = [], x
        for kind, name in self.plan:
            if kind == "push":
                skips.append(h)
            elif kind == "cat":
                h = torch.cat([h, skips.pop()], dim=1)
            elif kind == "mod":
                h = getattr(self, name)(h, emb)
            elif kind == "inj":
                h = getattr(self, name)(h, context)
            else:
                h = getattr(self, name)(h)
        return h


class TorchMelE1dTower(Encoder1d):
    """MelE1d's parameterised part: the Encoder1d tower + TanhBottleneck
    (the log-mel front end is parameter-free DSP)."""

    def forward(self, logmel):
        return torch.tanh(super().forward(logmel))


class TorchDMAE(nn.Module):
    """DiffusionAE layout mirror: encoder tower + LT analysis/synthesis
    convs + UNetV0, registered in the flax natural-sort order
    (encoder < lt_in < lt_out < unet)."""

    def __init__(self, in_channels=2, channels=(8, 16), factors=(1, 2),
                 items=(1, 1), linear_attentions=(0, 1),
                 attention_features=4, attention_heads=2, inject_depth=1,
                 latent_dim=4, resnet_groups=4, num_filters=8,
                 window_length=32, lt_stride=16, enc_channels=16,
                 enc_multipliers=(1, 1), enc_factors=(2,),
                 enc_num_blocks=(1,), n_mels=16):
        super().__init__()
        self.encoder = TorchMelE1dTower(
            in_channels=in_channels * n_mels, out_channels=latent_dim,
            channels=enc_channels, multipliers=enc_multipliers,
            factors=enc_factors, num_blocks=enc_num_blocks)
        pad = (window_length - lt_stride) // 2
        self.lt_in = nn.Conv1d(in_channels, num_filters, window_length,
                               stride=lt_stride, padding=pad)
        self.lt_out = nn.ConvTranspose1d(num_filters, in_channels,
                                         window_length, stride=lt_stride,
                                         padding=pad)
        ctx = [0] * len(channels)
        ctx[inject_depth] = latent_dim
        self.unet = TorchUNetV0(
            in_channels=num_filters, channels=channels, factors=factors,
            items=items, linear_attentions=linear_attentions,
            context_channels=ctx, attention_features=attention_features,
            attention_heads=attention_heads, resnet_groups=resnet_groups)

    def encode_mel(self, logmel):
        return self.encoder(logmel)

    def decode_v(self, x, t, latent):
        return self.lt_out(self.unet(self.lt_in(x), t, latent))
