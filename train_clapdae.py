#!/usr/bin/env python
"""Train the MIRAGE generator (StackedAELatentDiffusionCond).

Rebuild of the reference's training path for the CLAP-conditioned latent
diffusion model (reference StackedAELatentDiffusionCond.py:319-394):

  * frozen stage-1 stack encodes reals to 32-d latents (:335-336)
  * frozen CLAP embeds the mono mix to (B, 1, 512) conditioning (:360-365)
  * scrambled-Sobol timestep draws (:331, :370)
  * v-objective MSE with 0.1 CFG dropout (:380-384)
  * Adam lr 4e-5 + cosine annealing to 1e-6 over T_max=500 (:340-346)
  * EMA of the diffusion params, beta 0.9999 power 3/4 (:319-325, :396)

Data parallelism is a jit-with-shardings step over a jax Mesh (batch args
sharded on the 'data' axis, params/EMA/opt state replicated, gradients
all-reduced by the psum XLA inserts). Checkpoints (params + EMA + opt
state + step) go through orbax; `--ckpt_path` resumes.
"""
from __future__ import annotations

import json

import numpy as np

from audio_algebra_tpu.config import get_all_args
from audio_algebra_tpu.utils.logging import RunLogger


def main():
    import jax
    from audio_algebra_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()  # warm restarts skip recompiles
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_algebra_tpu.datasets import AudioDataset, DataLoader
    from audio_algebra_tpu.given_models import CLAPDAE
    from audio_algebra_tpu.models.ema import EMASchedule
    from audio_algebra_tpu.models.stacked import (
        LatentAudioDiffusionAutoencoder, v_objective_loss)
    from audio_algebra_tpu.parallel import make_mesh
    from audio_algebra_tpu.parallel.train import replicate_state
    from audio_algebra_tpu.checkpoint import (
        save_checkpoint, latest_checkpoint, load_checkpoint)
    from audio_algebra_tpu.utils.qmc import SobolSampler

    args = get_all_args()
    print(f"args = {args}")
    seed = args.seed

    train_set = AudioDataset([args.training_dir], sample_rate=args.sample_rate,
                             sample_size=args.sample_size,
                             random_crop=args.random_crop,
                             load_frac=args.load_frac,
                             cache_training_data=args.cache_training_data)
    train_dl = DataLoader(train_set, batch_size=args.batch_size, shuffle=True,
                          num_workers=args.num_workers, seed=seed)

    cfg = json.load(open(args.model_config)) if args.model_config else {}
    clapdae = CLAPDAE(sample_size=args.sample_size, debug=False,
                      first_stage_config=cfg.get("first_stage_config"),
                      model_kwargs=cfg.get("model_kwargs"),
                      clap_kwargs=cfg.get("clap_kwargs"))
    # loads LATENT_DIFFAE_CKPT / CLAP_CKPT when the env provides them;
    # random weights otherwise (the from-scratch training case)
    clapdae.setup(gdrive=False)

    ldm = clapdae.latent_diffusion_model
    params = clapdae.ldm_params
    ema_params = jax.tree_util.tree_map(jnp.copy, params)

    lr = getattr(args, 'lr', 4e-5)
    t_max = getattr(args, 'lr_t_max', 500)
    sched = optax.cosine_decay_schedule(lr, decay_steps=t_max,
                                        alpha=1e-6 / lr)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    ema_sched = EMASchedule(beta=0.9999, power=0.75)
    cfg_dropout = getattr(args, 'cfg_dropout', 0.1)

    n_dev = min(args.num_gpus if args.num_gpus > 0 else 1, len(jax.devices()))
    mesh = make_mesh(n_devices=n_dev)
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))

    params = replicate_state(params, mesh)
    ema_params = replicate_state(ema_params, mesh)
    opt_state = replicate_state(opt_state, mesh)

    # frozen encoders (outside the train step; no gradients flow there —
    # reference :338-340 torch.no_grad)
    diffae_params = replicate_state(clapdae.diffae_params, mesh)
    encode_fn = jax.jit(lambda p, x: clapdae.latent_diffae.apply(
        p, x, method=LatentAudioDiffusionAutoencoder.encode))

    model_apply = lambda p, x, t, **kw: ldm.apply(p, x, t, **kw)

    def step_fn(params, ema_params, opt_state, step_idx, latents, emb, t,
                key):
        # split + noise draw INSIDE the jit: eager per-step jax.random ops
        # dispatch through the axon relay uncached (see utils/prng.py) —
        # in-graph they compile into the step program and cost nothing
        k_noise, k_cfg = jax.random.split(jnp.asarray(key))
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)

        def loss_fn(p):
            return v_objective_loss(model_apply, p, latents, emb, t, noise,
                                    k_cfg, embedding_mask_proba=cfg_dropout)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_sched.update(params, ema_params, step_idx)
        return params, ema_params, opt_state, loss

    # jitted is built AFTER resume + state placement (fsdp shardings must
    # be declared on the jit, and resume rewrites the state trees)

    start_step = 0
    if args.ckpt_path:
        ck = latest_checkpoint(args.ckpt_path) or args.ckpt_path
        try:
            # Explicit-sharding restore: arrays land replicated on THIS
            # run's mesh regardless of the topology that wrote the file
            # (orbax's sharding-from-file is never consulted).
            restored = load_checkpoint(
                ck, {"params": jax.device_get(params),
                     "ema_params": jax.device_get(ema_params),
                     "opt_state": jax.device_get(opt_state), "step": 0},
                sharding=repl)
            params = restored["params"]
            ema_params = restored["ema_params"]
            opt_state = restored["opt_state"]
            start_step = int(restored["step"])
            print(f"Resumed from {ck} at step {start_step}")
        except Exception as e:
            print(f"Resume failed ({e}); starting fresh")

    # --fsdp 1: shard the f32 train state (params + EMA + Adam m/v) over
    # the data axis, ZeRO-3-style (parallel/fsdp.py). The single-chip
    # batch cap is the replicated state (~7.4 GiB resident for the
    # reference 'songs' model — BASELINE.md flash A/B), so sharding it is
    # how multi-chip actually buys batch, not just throughput. XLA
    # inserts the all-gathers/reduce-scatters from the declared shardings.
    use_fsdp = int(getattr(args, "fsdp", 0) or 0)
    if use_fsdp and mesh.shape["data"] > 1:
        from audio_algebra_tpu.parallel.fsdp import (shard_state,
                                                     state_bytes_per_device)
        resident = sum(state_bytes_per_device(t, mesh)
                       for t in (params, ema_params, opt_state))
        params, p_sh = shard_state(params, mesh)
        ema_params, e_sh = shard_state(ema_params, mesh)
        opt_state, o_sh = shard_state(opt_state, mesh)
        print(f"fsdp: train state sharded over data={mesh.shape['data']} "
              f"-> {resident / 2**30:.2f} GiB resident per device")
        jitted = jax.jit(step_fn, donate_argnums=(0, 1, 2),
                         in_shardings=(p_sh, e_sh, o_sh) + (None,) * 5,
                         out_shardings=(p_sh, e_sh, o_sh, None))
    else:
        jitted = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    logger = RunLogger(project='clapdae', name=args.name,
                       config=args.to_dict())
    sobol = SobolSampler(dim=1, scramble=True, seed=seed)
    from audio_algebra_tpu.utils.prng import host_key, host_split
    key = host_key(seed)
    max_epochs = getattr(args, 'max_epochs', 40)
    step = start_step

    def save(step):
        save_checkpoint(f"{logger.dir}/ckpt", {
            "params": jax.device_get(params),
            "ema_params": jax.device_get(ema_params),
            "opt_state": jax.device_get(opt_state), "step": step}, step=step)

    for epoch in range(max_epochs):
        for batch in train_dl:
            reals = jnp.asarray(np.asarray(batch))
            if reals.shape[0] % n_dev:
                # ragged tail batch: not shardable over the data axis —
                # drop it (torch DDP's drop_last-equivalent behaviour)
                continue
            reals = jax.device_put(reals, batch_shard)
            latents = encode_fn(diffae_params, reals)
            mono = reals.mean(axis=1)
            emb = clapdae.clap_module.get_audio_embedding_from_data(mono)
            emb = jax.device_put(emb[:, None, :], batch_shard)

            t = jax.device_put(jnp.asarray(sobol.draw(reals.shape[0])),
                               batch_shard)
            key, k_step = host_split(key)       # CPU-backend split, no relay
            params, ema_params, opt_state, loss = jitted(
                params, ema_params, opt_state, jnp.asarray(step),
                latents, emb, t, k_step)
            if step % 25 == 0:
                logger.log({"train_loss": float(loss),
                            "train_lr": float(sched(min(step, t_max))),
                            "train_ema_decay": float(ema_sched.decay(step)),
                            "epoch": epoch}, step=step)
            if args.checkpoint_every and step and \
                    step % args.checkpoint_every == 0:
                save(step)
            step += 1
    save(step)
    logger.finish()
    print("training done.")


if __name__ == "__main__":
    main()
