#!/usr/bin/env python
"""Train the AudioAlgebra mixer model (zsum ≈ zmix).

Rebuild of reference train_aa_mixer.py: frozen DVAE given model + trainable
AA MLP, VICReg losses, INI+CLI config (defaults.ini schema), periodic
checkpoints. The reference's Lightning DDP over NCCL (train_aa_mixer.py:
147-159) becomes a jit-with-shardings step over a jax Mesh — gradients
all-reduce via the psum XLA inserts; `num_gpus` from the INI is interpreted
as the device count.
"""
from __future__ import annotations

import numpy as np

from audio_algebra_tpu.config import get_all_args
from audio_algebra_tpu.utils.logging import RunLogger


def main():
    import jax
    from audio_algebra_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()  # warm restarts skip recompiles
    import jax.numpy as jnp
    import optax

    from audio_algebra_tpu.datasets import AudioDataset, DataLoader
    from audio_algebra_tpu.given_models import DVAEWrapper
    from audio_algebra_tpu.aa_mixer import (
        AABundle, make_mixer_loss_fn, get_stems_faders, given_model_encode_fn)
    from audio_algebra_tpu.parallel import make_mesh
    from audio_algebra_tpu.parallel.train import (
        make_data_parallel_step, replicate_state)
    from audio_algebra_tpu.checkpoint import save_checkpoint, latest_checkpoint, load_checkpoint

    args = get_all_args()
    print(f"args = {args}")
    seed = args.seed

    # data (reference :101-108)
    train_set = AudioDataset([args.training_dir], sample_rate=args.sample_rate,
                             sample_size=args.sample_size,
                             random_crop=args.random_crop, load_frac=args.load_frac,
                             cache_training_data=args.cache_training_data)
    train_dl = DataLoader(train_set, batch_size=args.batch_size, shuffle=True,
                          num_workers=min(args.num_workers, 8), seed=seed)

    # frozen given model (reference :118-122); `model_config` (INI key,
    # defaults.ini:77) points at a JSON of model kwargs for non-default sizes
    from audio_algebra_tpu.config import load_model_config
    model_kwargs, cfg_args = load_model_config(args.model_config)
    args_dict = {'sample_size': args.sample_size,
                 'latent_dim': args.latent_dim,
                 'num_quantizers': args.num_quantizers,
                 'pqmf_bands': args.pqmf_bands,
                 'ema_decay': args.ema_decay}
    args_dict.update(cfg_args)    # the config file describes the checkpoint
    given_model = DVAEWrapper(args_dict=args_dict, model_kwargs=model_kwargs)
    given_model.ckpt_info['ckpt_path'] = args.dvae_ckpt_file or \
        given_model.ckpt_info['ckpt_path']
    given_model.setup(gdrive=False)

    # trainable AA model (reference :131)
    aa = AABundle(dims=args.latent_dim,
                  hidden_dims=getattr(args, 'hidden_dims', args.latent_dim), seed=seed)
    loss_fn = make_mixer_loss_fn(aa.module, given_model_encode_fn(given_model))

    max_epochs = getattr(args, 'max_epochs', 40)
    accum = max(int(getattr(args, 'accum_batches', 1) or 1), 1)
    # the schedule counts OPTIMIZER UPDATES: under optax.MultiSteps the
    # inner Adam steps once per accum mini-batches, so sizing the cycle in
    # mini-batches would leave the LR near max_lr for the whole run
    total_steps = max(max(len(train_dl), 1) * max_epochs // accum, 1)
    sched = optax.cosine_onecycle_schedule(total_steps, getattr(args, 'max_lr', 1e-3))
    opt = optax.adam(sched)

    n_dev = min(args.num_gpus if args.num_gpus > 0 else 1, len(jax.devices()))
    mesh = make_mesh(n_devices=n_dev)
    # stems arrive batch-leading (B, S, C, T) so the dp sharding hits the
    # batch axis; swap back to the (S, B, C, T) the loss expects inside jit
    step_fn = make_data_parallel_step(
        lambda p, stems_b, faders, batch: loss_fn(
            p, jnp.swapaxes(stems_b, 0, 1), faders, batch),
        opt, mesh, accum_steps=args.accum_batches)

    params = replicate_state(aa.params, mesh)
    # init from the step's (possibly MultiSteps-wrapped) optimizer so the
    # state matches what optimizer.update inside the step expects
    opt_state_template = step_fn.optimizer.init(aa.params)
    opt_state = replicate_state(opt_state_template, mesh)

    # resume (reference ckpt_path, :160). Restores params AND opt_state so
    # Adam moments / accumulation / the OneCycle schedule position survive
    # the restart (Lightning resume restores optimizer state too).
    start_step = 0
    if args.ckpt_path:
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(mesh, PartitionSpec())  # explicit: topology-robust
        ck = latest_checkpoint(args.ckpt_path) or args.ckpt_path
        try:
            restored = load_checkpoint(
                ck, {"params": aa.params, "step": 0,
                     "opt_state": jax.device_get(opt_state_template)},
                sharding=repl)
            params = restored["params"]
            if restored.get("opt_state") is not None:
                opt_state = restored["opt_state"]
            start_step = int(restored["step"])
            print(f"Resumed from {ck} at step {start_step}")
        except Exception as e:
            # older checkpoints have no opt_state entry — restore params only
            try:
                restored = load_checkpoint(ck, {"params": aa.params, "step": 0},
                                           sharding=repl)
                params = restored["params"]
                start_step = int(restored["step"])
                print(f"Resumed (params only, no opt_state) from {ck} "
                      f"at step {start_step}")
            except Exception:
                print(f"Resume failed ({e}); starting fresh")

    logger = RunLogger(project='aa-mixer-vicreg', name=args.name,
                       config=args.to_dict())
    rng = np.random.default_rng(seed)

    def demo(step, stems, faders):
        """Decoded zsum/zmix audio every demo_every steps (reference
        aa_demo, aa_mixer.py:330-341)."""
        from audio_algebra_tpu.aa_mixer import do_mixing, aa_demo
        try:
            aa.params = jax.device_get(params)
            zsum, zmix, _ = do_mixing(stems[:, :1], faders, given_model, aa)
            logs = aa_demo(given_model, aa, {}, zsum, zmix, step,
                           demo_steps=min(getattr(args, 'demo_steps', 35), 35),
                           sr=args.sample_rate, out_dir=str(logger.dir))
            logger.log({f"demo/{k}": v for k, v in logs.items()}, step=step)
        except Exception as e:
            print(f"demo error (non-fatal): {e}")

    demo_every = getattr(args, 'demo_every', 0)
    step = start_step
    for epoch in range(max_epochs):
        train_iter = iter(train_dl)
        for batch in train_dl:
            batch = np.asarray(batch)
            stems, faders, train_iter = get_stems_faders(
                batch, train_iter, train_dl, rng=rng)
            if demo_every and step and step % demo_every == 0 \
                    and jax.process_index() == 0:
                demo(step, stems, faders)
            # stems leading dim is S; shard batch axis by swapping to front
            stems_b = np.swapaxes(stems, 0, 1)
            params, opt_state, logs = step_fn(
                params, opt_state,
                np.ascontiguousarray(stems_b), faders, batch)
            if step % 25 == 0:
                out = {k: float(v) for k, v in logs.items()}
                out.update(epoch=epoch, learning_rate=float(
                    sched(min(step // accum, total_steps - 1))))
                logger.log(out, step=step)
            if args.checkpoint_every and step and step % args.checkpoint_every == 0:
                save_checkpoint(f"{logger.dir}/ckpt", {
                    "params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "step": step}, step=step)
            step += 1
    save_checkpoint(f"{logger.dir}/ckpt", {"params": jax.device_get(params),
                                           "opt_state": jax.device_get(opt_state),
                                           "step": step}, step=step)
    logger.finish()
    print("training done.")


if __name__ == "__main__":
    main()
