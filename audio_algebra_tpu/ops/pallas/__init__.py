"""Pallas TPU kernels for the DSP hot path."""

from .stft_kernel import pallas_stft  # noqa: F401
