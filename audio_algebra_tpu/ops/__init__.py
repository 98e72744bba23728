"""TPU-native DSP ops: the rebuild of the reference's torchaudio C++ front-end.

The reference leaned on torchaudio's native kernels (Spectrogram,
InverseSpectrogram, GriffinLim, MelSpectrogram, InverseMelScale, Resample —
reference given_models.py:158-269, :445-446). Here each op is formulated for
the MXU: DFTs are windowed-frame matmuls against precomputed bases, filters
are scanned second-order sections or FIR convs, and resampling is a single
strided/dilated convolution.
"""

from .stft import (  # noqa: F401
    stft,
    istft,
    spectrogram,
    inverse_spectrogram,
    griffin_lim,
    hann_window,
)
from .mel import (  # noqa: F401
    mel_filterbank,
    melspectrogram,
    inverse_mel_scale,
)
from .resample import resample, resample_kernel  # noqa: F401
from .filters import (  # noqa: F401
    biquad_coeffs,
    butter_sos,
    sosfilt,
    apply_gain_db,
    lowpass,
    highpass,
    bandpass,
    bandstop,
)
from .phase import phase_integrate, mag_dphase_encode, mag_dphase_decode  # noqa: F401
from .pqmf import PQMF  # noqa: F401
