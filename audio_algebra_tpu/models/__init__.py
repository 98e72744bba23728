"""Model zoo: JAX/flax rebuilds of the frozen pretrained models the reference
wraps (SoundStreamXLEncoder, DiffusionAttnUnet1D, AudioAutoencoder, Encoder1d,
UNetCFG1d, Memcodes — reference DiffusionDVAE.py:98-160,
StackedAELatentDiffusionCond.py:177-331) plus the trainable AudioAlgebra MLP
(reference aa_mixer.py:205-267).

Convention: public `__call__`/encode/decode APIs take and return (B, C, T)
tensors matching the reference's torch layout; internally everything runs
channels-last (B, T, C) so convolutions hit the MXU with the feature axis on
the 128-lane dimension.
"""

from .blocks import FourierFeatures, ResConvBlock, SelfAttention1d  # noqa: F401
from .soundstream import SoundStreamXLEncoder, SoundStreamXLDecoder  # noqa: F401
from .unet1d import DiffusionAttnUnet1D  # noqa: F401
from .audio_ae import AudioAutoencoder  # noqa: F401
from .encoder1d import Encoder1d  # noqa: F401
from .memcodes import Memcodes, ResidualMemcodes  # noqa: F401
from .aa import EmbedBlock, AudioAlgebra  # noqa: F401
from .ema import ema_update, EMASchedule  # noqa: F401
from .unet_cfg1d import UNetCFG1d  # noqa: F401
from .dvae import DiffusionDVAE  # noqa: F401
from .stacked import LatentAudioDiffusionAutoencoder, StackedAELatentDiffusionCond  # noqa: F401
