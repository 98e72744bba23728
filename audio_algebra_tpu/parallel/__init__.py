"""Parallelism: mesh construction + sharded train/inference steps.

Replaces the reference's NCCL data parallelism (pytorch-lightning DDP,
`strategy="ddp_find_unused_parameters_false"` — reference
train_aa_mixer.py:147-159; HF Accelerate — aa_mixer.py:388) with
`jax.sharding.Mesh` + jit-with-shardings: the gradient all-reduce the DDP
wrapper injected becomes a `psum` XLA emits from the sharding annotations,
riding ICI.
"""

from .mesh import make_mesh, mesh_from_spec, batch_sharding, replicated  # noqa: F401
from .train import make_data_parallel_step, shard_batch, host_device_count  # noqa: F401
from .infer import decode_unet_seqpar, pick_sharded_levels  # noqa: F401
