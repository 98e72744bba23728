"""aa_effects — the effects-algebra ("king − man + woman") task.

Rebuild of reference audio_algebra/aa_effects.py: two clips (a, b) × two
effects (e1, e2); train h so that za2 ≈ za1 + (zb2 − zb1) — the effect
direction transfers between clips — with the same VICReg regularisers and
inversion loss as the mixer task.

Shares EmbedBlock/AudioAlgebra/losses with aa_mixer (the reference
duplicates them; here they are imported — one definition, one test surface).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.aa import AudioAlgebra, EmbedBlock  # noqa: F401
from .aa_mixer import (  # noqa: F401
    mseloss, vicreg_var_loss, off_diagonal, vicreg_cov_loss, AABundle,
    aa_demo, given_model_encode_fn,
)

__all__ = ['mseloss', 'EmbedBlock', 'AudioAlgebra', 'do_mixing', 'aa_demo',
           'vicreg_var_loss', 'off_diagonal', 'vicreg_cov_loss',
           'make_effects_loss_fn', 'train_aa_model']


def do_mixing(batch: dict, given_model, aa_model, device=None, debug=False):
    """Encode the (a1, b1, a2, b2) 4-tuple through f then h (reference
    aa_effects.py:116-125). Returns {'ys','zs','yrecons'}."""
    keys = ["a1", "b1", "a2", "b2"]
    xs = [jnp.asarray(batch[k]) for k in keys]
    ys = [given_model.encode(x) for x in xs]
    zs = [aa_model.encode(y) for y in ys]
    yrecons = [aa_model.decode(z) for z in zs]
    return {'ys': ys, 'zs': zs, 'yrecons': yrecons}


def make_effects_loss_fn(aa_module: AudioAlgebra, encode_fn: Callable):
    """Pure jittable effects loss (the reference AAEffectsModule
    training_step, train_aa_effects.py:58-98): batched 4-way encode, algebra
    guesses, VICReg + 4-way recon."""

    def loss_fn(aa_params, a1, b1, a2, b2):
        b = a1.shape[0]
        stacked = jnp.concatenate([a1, b1, a2, b2], axis=0)
        y_all = jax.lax.stop_gradient(encode_fn(stacked))
        z_all, yrec_all = aa_module.apply(aa_params, y_all)
        za1, zb1, za2, zb2 = jnp.split(z_all, 4, axis=0)

        za2_guess = za1 + (zb2 - zb1)
        zb2_guess = zb1 + (za2 - za1)
        mix_loss = mseloss(za2_guess, za2) + mseloss(zb2_guess, zb2)
        var_loss = (vicreg_var_loss(za2_guess) + vicreg_var_loss(zb2_guess)) / 2
        cov_loss = (vicreg_cov_loss(za2_guess) + vicreg_cov_loss(zb2_guess)) / 2
        aa_recon_loss = mseloss(yrec_all, y_all) * 4.0   # sum of 4 means

        loss = mix_loss + var_loss + cov_loss + aa_recon_loss
        logs = {'train_loss': loss, 'mix_loss': mix_loss, 'var_loss': var_loss,
                'cov_loss': cov_loss, 'aa_recon_loss': aa_recon_loss}
        return loss, logs

    return loss_fn


def train_aa_model(given_model, train_dl, args, aa_model: Optional[AABundle] = None,
                   logger=None, debug: bool = False):
    """Effects-task training loop (reference aa_effects.py:165-251):
    Adam 5e-4 + OneCycle, jitted end-to-end step."""
    import optax

    max_epochs = getattr(args, 'max_epochs', 40)
    steps_per_epoch = getattr(args, 'steps_per_epoch', None) or len(train_dl)
    total_steps = steps_per_epoch * max_epochs
    max_lr = getattr(args, 'max_lr', 1e-3)
    seed = getattr(args, 'seed', 42)

    if aa_model is None:
        aa_model = AABundle(dims=args.latent_dim,
                            hidden_dims=getattr(args, 'hidden_dims', 64),
                            seed=seed)

    sched = optax.cosine_onecycle_schedule(total_steps, max_lr)
    opt = optax.adam(sched)
    opt_state = opt.init(aa_model.params)
    enc = given_model_encode_fn(given_model)

    @jax.jit
    def train_step(params, opt_state, enc_params, a1, b1, a2, b2):
        # frozen encoder params as arguments, not baked XLA constants
        # (see aa_mixer.train_aa_model)
        loss_fn = make_effects_loss_fn(
            aa_model.module, lambda x: enc.pure(enc_params, x))
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, a1, b1, a2, b2)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    params, step = aa_model.params, 0
    history = []
    for epoch in range(max_epochs):
        for batch_i, batch in enumerate(train_dl):
            if batch_i >= steps_per_epoch:
                break   # keep the loop on the OneCycle schedule's clock
            params, opt_state, logs = train_step(
                params, opt_state, enc.get_params(),
                jnp.asarray(batch["a1"]), jnp.asarray(batch["b1"]),
                jnp.asarray(batch["a2"]), jnp.asarray(batch["b2"]))
            logs = {k: float(v) for k, v in logs.items()}
            logs.update(epoch=epoch, step=step,
                        learning_rate=float(sched(step)))
            if logger is not None:
                logger.log(logs)
            history.append(logs)
            step += 1
    aa_model.params = params
    return aa_model, history
