"""audio_algebra_tpu — a TPU-native (JAX/XLA/Pallas) audio-embedding-algebra framework.

A ground-up rebuild of the capabilities of drscotthawley/audio-algebra
("alchemy with embeddings"): frozen pretrained audio autoencoders behind a
uniform encode/decode API, a trainable re-embedding map trained with
VICReg-style losses so that vector algebra holds in embedding space,
corpus-scale embedding statistics (effect-direction PCA), and generation
apps (Destructo-style mathemangling, MIRAGE CLAP-conditioned latent
diffusion).

Design stance (TPU-first, not a torch translation):
  * DSP front-end (STFT/mel/resample/filters) = MXU matmul formulations +
    Pallas kernels, not FFT-library calls.
  * Models are flax.linen modules traced once under jit; diffusion sampling
    loops are `lax.scan`, never Python loops.
  * Parallelism is `jax.sharding.Mesh` + pjit/shard_map with XLA collectives
    (the reference used NCCL DDP via pytorch-lightning / accelerate).
  * Checkpoints via orbax; EMA as pure pytree maps.

Reference layer map: /root/repo/SURVEY.md §1; component inventory §2.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
