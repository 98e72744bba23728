#!/usr/bin/env python
"""Train the AA mixer with the manual-collectives loop (Accelerate variant).

Rebuild of reference train_aa_mixer_accel.py (the self-contained
HF-Accelerate script, :463-553): where train_aa_mixer.py uses the
sharding-annotated jit step (XLA infers the gradient all-reduce), this
variant drives `parallel.manual.make_manual_ddp_step` — a `jax.shard_map`
per-device function with an explicit `jax.lax.pmean` gradient collective,
the TPU-native spelling of what `accelerator.backward` did in the
reference. For per-example losses the two steps are update-equivalent
(tests/test_parallel.py); for the mixer's batch-coupled VICReg terms this
variant reproduces the reference DDP's local-shard statistics while the
annotated step uses global-batch statistics — the two entry points differ
exactly the way the reference's pair did: same task, different
parallelism plumbing.

Also mirrors the accel script's flavor: HostPrinter rank-0 printing
(reference :47), a flat manual epoch/step loop, and inline loss
composition — no trainer framework. The setup/loop scaffolding shared
with train_aa_mixer.py is DELIBERATELY duplicated, exactly as the
reference's accel script duplicated its Lightning sibling inline: both
entry points are self-contained and each is covered by its own
run+checkpoint+resume subprocess test, which is what keeps them honest.
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
    from audio_algebra_tpu.parallel.manual import make_manual_ddp_step
    from audio_algebra_tpu.parallel.train import replicate_state
    from audio_algebra_tpu.parallel.multihost import HostPrinter
    from audio_algebra_tpu.checkpoint import (
        save_checkpoint, latest_checkpoint, load_checkpoint)

    args = get_all_args()
    hprint = HostPrinter(prefix="[accel] ")
    hprint(f"args = {args}")
    seed = args.seed

    train_set = AudioDataset([args.training_dir], sample_rate=args.sample_rate,
                             sample_size=args.sample_size,
                             random_crop=args.random_crop,
                             load_frac=args.load_frac,
                             cache_training_data=args.cache_training_data)
    train_dl = DataLoader(train_set, batch_size=args.batch_size, shuffle=True,
                          num_workers=min(args.num_workers, 8), seed=seed)

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

    aa = AABundle(dims=args.latent_dim,
                  hidden_dims=getattr(args, 'hidden_dims', args.latent_dim),
                  seed=seed)
    loss_fn = make_mixer_loss_fn(aa.module, given_model_encode_fn(given_model))

    max_epochs = getattr(args, 'max_epochs', 40)
    accum = max(int(getattr(args, 'accum_batches', 1) or 1), 1)
    # schedule counts OPTIMIZER UPDATES (MultiSteps steps once per accum)
    total_steps = max(max(len(train_dl), 1) * max_epochs // accum, 1)
    sched = optax.cosine_onecycle_schedule(total_steps,
                                           getattr(args, 'max_lr', 1e-3))
    opt = optax.adam(sched)

    n_dev = min(args.num_gpus if args.num_gpus > 0 else 1, len(jax.devices()))
    mesh = make_mesh(n_devices=n_dev)
    step_fn = make_manual_ddp_step(
        lambda p, stems_b, faders, batch: loss_fn(
            p, jnp.swapaxes(stems_b, 0, 1), faders, batch),
        opt, mesh, accum_steps=args.accum_batches)

    params = replicate_state(aa.params, mesh)
    opt_state_template = step_fn.optimizer.init(aa.params)
    opt_state = replicate_state(opt_state_template, mesh)

    start_step = 0
    if args.ckpt_path:
        ck = latest_checkpoint(args.ckpt_path) or args.ckpt_path
        try:
            restored = load_checkpoint(
                ck, {"params": aa.params, "step": 0,
                     "opt_state": jax.device_get(opt_state_template)})
            params = replicate_state(restored["params"], mesh)
            if restored.get("opt_state") is not None:
                opt_state = replicate_state(restored["opt_state"], mesh)
            start_step = int(restored["step"])
            hprint(f"Resumed from {ck} at step {start_step}")
        except Exception as e:
            # older checkpoints have no opt_state entry (or a mismatched
            # MultiSteps tree) — keep the trained params at least, like
            # train_aa_mixer.py does
            try:
                restored = load_checkpoint(ck, {"params": aa.params,
                                                "step": 0})
                params = replicate_state(restored["params"], mesh)
                start_step = int(restored["step"])
                hprint(f"Resumed (params only, no opt_state) from {ck} "
                       f"at step {start_step}")
            except Exception:
                hprint(f"Resume failed ({e}); starting fresh")

    logger = RunLogger(project='aa-mixer-vicreg', name=args.name,
                       config=args.to_dict())
    rng = np.random.default_rng(seed)

    step = start_step
    for epoch in range(max_epochs):
        train_iter = iter(train_dl)
        for batch in train_dl:
            batch = np.asarray(batch)
            stems, faders, train_iter = get_stems_faders(
                batch, train_iter, train_dl, rng=rng)
            stems_b = np.swapaxes(stems, 0, 1)
            params, opt_state, logs = step_fn(
                params, opt_state,
                np.ascontiguousarray(stems_b), faders, batch)
            if step % 25 == 0:
                out = {k: float(v) for k, v in logs.items()}
                out.update(epoch=epoch, learning_rate=float(
                    sched(min(step // accum, total_steps - 1))))
                logger.log(out, step=step)
                hprint(f"step {step}: " + " ".join(
                    f"{k}={v:.4g}" for k, v in out.items()))
            if args.checkpoint_every and step and \
                    step % args.checkpoint_every == 0:
                save_checkpoint(f"{logger.dir}/ckpt", {
                    "params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "step": step}, step=step)
            step += 1
    save_checkpoint(f"{logger.dir}/ckpt", {"params": jax.device_get(params),
                                           "opt_state": jax.device_get(opt_state),
                                           "step": step}, step=step)
    logger.finish()
    hprint("training done.")


if __name__ == "__main__":
    main()
