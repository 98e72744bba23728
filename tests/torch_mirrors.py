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
