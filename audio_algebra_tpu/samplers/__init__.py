"""Diffusion samplers as fused `lax.scan` loops.

The reference's decode hot loop is a Python `for i in trange(steps)` of
sequential UNet forwards (reference DiffusionDVAE.py:54-95 and four vendored
copies; k-diffusion path StackedAELatentDiffusionCond.py:118-173). Here each
sampler is a single scan inside one jit program: the schedule is precomputed,
every step is the same traced UNet call, and XLA pipelines the whole decode.
"""

from .vddim import (  # noqa: F401
    get_alphas_sigmas,
    get_crash_schedule,
    alpha_sigma_to_t,
    sample,
    sample_manual,
    resample_diffusion,
)
from .kdiff import (  # noqa: F401
    VDenoiser,
    get_sigmas_polyexponential,
    sample_dpmpp_2m,
    kdiff_sample,
)
