#!/usr/bin/env python
"""Train the AudioAlgebra effects model (za2 ≈ za1 + (zb2 − zb1)).

Rebuild of reference train_aa_effects.py: DualEffectsDataset + frozen DVAE +
trainable AA with the algebra loss, periodic demo logging (embeddings /
PCA / audio — DemoCallback, reference :111-188), exception-tolerant loop
(ExceptionCallback :106-108). Data parallelism over a jax Mesh replaces
Lightning DDP (:252-264).
"""
from __future__ import annotations

import traceback

import numpy as np

from audio_algebra_tpu.config import get_all_args
from audio_algebra_tpu.utils.logging import RunLogger


def demo_log(logger, aa, given_model, val_batch, step: int, sr: int,
             demo_steps: int = 35):
    """Rank-0 demo logging with full media parity (reference DemoCallback,
    train_aa_effects.py:123-188): embeddings table, 3-D PCA cloud, token
    spectrograms of the embeddings, and decoded audio for the algebra
    result (za2_guess = zb2 - zb1 + za1) next to the true za2."""
    import jax.numpy as jnp
    from audio_algebra_tpu import aa_effects
    from audio_algebra_tpu.utils.viz import (pca_point_cloud,
                                             embeddings_table,
                                             tokens_spectrogram_image,
                                             save_image)
    from audio_algebra_tpu.utils.audio_io import save_audio

    try:
        archive = aa_effects.do_mixing(val_batch, given_model, aa, None)
        zs = archive["zs"]
        names = ["za1", "zb1", "za2", "zb2"]
        table = embeddings_table(zs, names=names)   # {name: stats dict}
        cols = ["name"] + list(next(iter(table.values())).keys())
        rows = [[n] + [s[c] for c in cols[1:]] for n, s in table.items()]
        logger.log_table("demo/emb_stats", cols, rows, step=step)
        cloud = pca_point_cloud(jnp.concatenate(zs, axis=0))
        logger.log_point_cloud("demo/pca_cloud", cloud, step=step)
        # token spectrograms (reference :158-166)
        for name, z in zip(names, zs):
            img = tokens_spectrogram_image(z)
            path = save_image(img, str(logger.dir / f"tokens_{name}_{step:08d}.png"))
            if path is None:      # no PIL/matplotlib: keep the raw array
                path = str(logger.dir / f"tokens_{name}_{step:08d}.npy")
                np.save(path, img)
                logger.log({f"demo/tokens_{name}": path}, step=step)
            else:
                logger.log_image(f"demo/tokens_{name}", path, step=step)
        # decoded audio: the algebra guess and the target (reference :168-183)
        za1, zb1, za2, zb2 = zs
        za2_guess = zb2 - zb1 + za1
        for name, z in (("za2_guess", za2_guess), ("za2", za2)):
            y = aa.decode(z[:1])                     # h^-1 back to y-space
            fake = given_model.decode(y, demo_steps)
            logger.log_audio(f"demo/{name}", np.asarray(fake), sr, step=step)
    except Exception as e:
        print(f"demo_log error (non-fatal): {e}")


def main():
    import jax
    from audio_algebra_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()  # warm restarts skip recompiles
    import jax.numpy as jnp
    import optax

    from audio_algebra_tpu.datasets import DualEffectsDataset, DataLoader
    from audio_algebra_tpu.given_models import DVAEWrapper
    from audio_algebra_tpu.aa_effects import make_effects_loss_fn
    from audio_algebra_tpu.aa_mixer import AABundle, given_model_encode_fn
    from audio_algebra_tpu.parallel import make_mesh
    from audio_algebra_tpu.parallel.train import (
        make_data_parallel_step, replicate_state)
    from audio_algebra_tpu.checkpoint import save_checkpoint

    args = get_all_args()
    print(f"args = {args}")

    train_set = DualEffectsDataset([args.training_dir], sample_rate=args.sample_rate,
                                   sample_size=args.sample_size,
                                   random_crop=args.random_crop,
                                   load_frac=args.load_frac)
    train_dl = DataLoader(train_set, batch_size=args.batch_size, shuffle=True,
                          num_workers=min(args.num_workers, 8), seed=args.seed)

    from audio_algebra_tpu.config import load_model_config
    model_kwargs, cfg_args = load_model_config(args.model_config)
    args_dict = {'sample_size': args.sample_size,
                 'latent_dim': args.latent_dim}
    args_dict.update(cfg_args)    # the config file describes the checkpoint
    given_model = DVAEWrapper(args_dict=args_dict, model_kwargs=model_kwargs)
    given_model.ckpt_info['ckpt_path'] = args.dvae_ckpt_file or \
        given_model.ckpt_info['ckpt_path']
    given_model.setup(gdrive=False)

    aa = AABundle(dims=args.latent_dim,
                  hidden_dims=getattr(args, 'hidden_dims', args.latent_dim),
                  seed=args.seed)
    loss_fn = make_effects_loss_fn(aa.module, given_model_encode_fn(given_model))

    max_epochs = getattr(args, 'max_epochs', 40000)
    accum = max(int(getattr(args, 'accum_batches', 1) or 1), 1)
    # schedule counts OPTIMIZER UPDATES (MultiSteps steps once per accum)
    total_steps = max(max(len(train_dl), 1) * min(max_epochs, 1000) // accum, 1)
    sched = optax.cosine_onecycle_schedule(total_steps, getattr(args, 'max_lr', 1e-3))
    opt = optax.adam(sched)

    n_dev = min(args.num_gpus if args.num_gpus > 0 else 1, len(jax.devices()))
    mesh = make_mesh(n_devices=n_dev)
    step_fn = make_data_parallel_step(loss_fn, opt, mesh,
                                      accum_steps=args.accum_batches)
    params = replicate_state(aa.params, mesh)
    # init from the step's (possibly MultiSteps-wrapped) optimizer
    opt_state = replicate_state(step_fn.optimizer.init(aa.params), mesh)

    logger = RunLogger(project='aa-effects', name=args.name, config=args.to_dict())
    logger.push_config(args)

    val_batch = None
    step = 0
    try:
        for epoch in range(max_epochs):
            for batch in train_dl:
                if val_batch is None:
                    val_batch = batch
                params, opt_state, logs = step_fn(
                    params, opt_state, batch["a1"], batch["b1"],
                    batch["a2"], batch["b2"])
                if step % 25 == 0:
                    out = {k: float(v) for k, v in logs.items()}
                    out.update(epoch=epoch, learning_rate=float(
                        sched(min(step // accum, total_steps - 1))))
                    logger.log(out, step=step)
                if args.demo_every and step and step % args.demo_every == 0 \
                        and jax.process_index() == 0:
                    aa.params = jax.device_get(params)
                    demo_log(logger, aa, given_model, val_batch, step,
                             args.sample_rate,
                             demo_steps=min(getattr(args, 'demo_steps', 35), 35))
                if args.checkpoint_every and step and step % args.checkpoint_every == 0:
                    save_checkpoint(f"{logger.dir}/ckpt",
                                    {"params": jax.device_get(params),
                                     "opt_state": jax.device_get(opt_state),
                                     "step": step}, step=step)
                step += 1
    except Exception:
        # ExceptionCallback parity (reference :106-108)
        print("~~~~ training raised: ~~~~")
        traceback.print_exc()
        raise
    finally:
        save_checkpoint(f"{logger.dir}/ckpt",
                        {"params": jax.device_get(params),
                         "opt_state": jax.device_get(opt_state),
                         "step": step}, step=step)
        logger.finish()


if __name__ == "__main__":
    main()
