"""Fused STFT as a Pallas TPU kernel.

One kernel fuses the whole front-end per signal row: async-DMA the padded
row from HBM into VMEM once, then for each frame tile slice hop-strided
frames out of VMEM, apply the window, and run both DFT matmuls (cos/sin
bases resident in VMEM) on the MXU. The framed signal never round-trips
through HBM — the XLA path (ops.stft) materialises (F, n_fft) frames there
(4x the signal at hop = n_fft/4).

Grid: (rows,). Frame tiles loop inside the kernel (fori_loop) because the
overlapping spans cannot be expressed as BlockSpec index maps, and HBM
slices along the row axis must stay tile-aligned (Mosaic constraint) — so
the row is copied whole (a 65536-sample row is 256 KB of VMEM).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..stft import _dft_bases, hann_window, _reflect_pad

FRAMES_PER_TILE = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center",
                                             "interpret"))
def pallas_stft(x: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
                center: bool = True, interpret: bool = False) -> jnp.ndarray:
    """Complex STFT of (..., T) -> complex64 (..., n_bins, F).

    Drop-in for ops.stft.stft (hann window, torch layout). CPU/debug via
    interpret=True.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if center:
        x = _reflect_pad(x, n_fft // 2)
    *batch, t = x.shape
    xb = x.reshape(-1, t)
    n_rows = xb.shape[0]
    n_frames = 1 + (t - n_fft) // hop_length
    n_bins = n_fft // 2 + 1
    nb_pad = _round_up(n_bins, 128)

    ft = FRAMES_PER_TILE
    n_tiles = -(-n_frames // ft)
    # chunk the frame axis: the output blocks tile over grid dim 1, so VMEM
    # holds only one chunk's spectrogram slab (2 x ~320 KB) instead of the
    # whole row's (which at a 22 s signal is 2 x ~10 MB -> Mosaic OOM). The
    # signal row itself still sits in VMEM whole (overlapping frame spans
    # can't be expressed as BlockSpec index maps), so very long rows gate
    # to the XLA path below.
    chunk_tiles = min(n_tiles, 8)                   # 128 frames per chunk
    n_chunks = -(-n_tiles // chunk_tiles)
    total_tiles = n_chunks * chunk_tiles
    span = (total_tiles * ft - 1) * hop_length + n_fft
    span = _round_up(span, 1024)                    # rows of 128, 8-row tiles

    row_bytes = span * 4
    base_bytes = 2 * n_fft * nb_pad * 4
    if n_fft % 128 != 0 or hop_length % 128 != 0 \
            or row_bytes + base_bytes > 10 * 2**20:
        # lane-fold layout needs 128-aligned frame starts, and the whole
        # padded row must fit VMEM alongside the DFT bases; fall back
        from ..stft import stft as _stft
        return _stft(x, n_fft, hop_length, center=False)

    if span > t:
        xb = jnp.pad(xb, ((0, 0), (0, span - t)))
    # fold each signal row onto the (sublane, lane) grid: (rows, span/128, 128)
    x3 = xb[:, :span].reshape(n_rows, span // 128, 128)
    rows_per_frame = n_fft // 128
    rows_per_hop = hop_length // 128

    cos_b, sin_b = _dft_bases(n_fft)
    cosb = jnp.asarray(np.pad(cos_b, ((0, 0), (0, nb_pad - n_bins))))
    sinb = jnp.asarray(np.pad(sin_b, ((0, 0), (0, nb_pad - n_bins))))
    win2 = hann_window(n_fft).reshape(rows_per_frame, 128)

    def kernel(x_ref, win_ref, cos_ref, sin_ref, re_ref, im_ref, frames):
        chunk = pl.program_id(1)

        def tile_body(tile, carry):
            base_row = (chunk * chunk_tiles + tile) * (ft * rows_per_hop)
            for i in range(ft):                     # static unroll
                r0 = base_row + i * rows_per_hop
                for r in range(rows_per_frame):     # 128-lane row copies
                    frames[i, pl.ds(r * 128, 128)] = \
                        x_ref[0, r0 + r, :] * win_ref[r, :]
            re_ref[0, pl.ds(tile * ft, ft), :] = jax.lax.dot(
                frames[:], cos_ref[:], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            im_ref[0, pl.ds(tile * ft, ft), :] = jax.lax.dot(
                frames[:], sin_ref[:], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, chunk_tiles, tile_body, 0)

    cf = chunk_tiles * ft                           # frames per chunk
    out_shape = jax.ShapeDtypeStruct((n_rows, total_tiles * ft, nb_pad),
                                     jnp.float32)
    re, im = pl.pallas_call(
        kernel,
        grid=(n_rows, n_chunks),
        in_specs=[
            pl.BlockSpec((1, span // 128, 128), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_frame, 128), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, nb_pad), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, nb_pad), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cf, nb_pad), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cf, nb_pad), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((ft, n_fft), jnp.float32)],
        interpret=interpret,
    )(x3.astype(jnp.float32), win2, cosb, sinb)

    re = re[:, :n_frames, :n_bins]
    im = im[:, :n_frames, :n_bins]
    spec = jax.lax.complex(re, im)
    spec = jnp.swapaxes(spec, -1, -2)                     # (rows, bins, F)
    return spec.reshape(*batch, n_bins, n_frames)
