"""aa_mixer — the mixer-algebra task: losses, mixing, and training.

Rebuild of reference audio_algebra/aa_mixer.py: the trainable AudioAlgebra
map h is trained so that encode-then-sum equals sum-then-encode
(`zsum ≈ zmix`) with VICReg variance/covariance regularisers and an
inversion (recon) loss.

TPU redesign notes:
  * `do_mixing`'s Python loop over stems (reference aa_mixer.py:295-327)
    becomes a stacked (S, B, C, T) tensor pass — stems are encoded in one
    batched forward and summed with one reduction; the whole training step
    is a single jit program.
  * `vicreg_cov_loss` (reference :360-364) materialised a (c·t, c·t)
    covariance matrix — 4 GB at the reference's own default shapes. The
    rebuild computes the identical scalar via the Gram trick:
    ||C||_F^2 = ||Z^T Z||_F^2/(b-1)^2 uses only a (b, b) matmul.
  * `get_stems_faders` stays host-side (it drives the dataloader iterator,
    reference :270-292) and returns a stacked array.
"""
from __future__ import annotations

import math
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.aa import AudioAlgebra, EmbedBlock  # noqa: F401 (public API parity)

__all__ = ['mseloss', 'EmbedBlock', 'AudioAlgebra', 'AABundle',
           'get_stems_faders', 'do_mixing', 'aa_demo', 'vicreg_var_loss',
           'off_diagonal', 'vicreg_cov_loss', 'make_mixer_loss_fn',
           'train_aa_model']


# ------------------------------------------------------------------ losses ---

def mseloss(a, b):
    return jnp.mean(jnp.square(a - b))


def vicreg_var_loss(z, gamma: float = 1.0, eps: float = 1e-4):
    """Hinge on per-feature std across the batch (reference aa_mixer.py:351-353)."""
    std_z = jnp.sqrt(z.var(axis=0) + eps)
    return jnp.mean(jax.nn.relu(gamma - std_z))


def off_diagonal(x):
    """Off-diagonal elements of a square matrix (reference :355-358)."""
    n, m = x.shape
    assert n == m
    return x.flatten()[:-1].reshape(n - 1, n + 1)[:, 1:].flatten()


def vicreg_cov_loss(z):
    """Sum of squared off-diagonal covariance entries / num_features
    (reference :360-364) — computed via the Gram identity, never forming
    the (c·t, c·t) matrix:

        C = Z_c Z_c^T/(b-1),  ||C||_F^2 = ||Z_c^T Z_c||_F^2/(b-1)^2
        off_diag_sq = ||C||_F^2 − Σ_i C_ii^2,  C_ii = row_sq_i/(b-1)
    """
    b = z.shape[0]
    num_features = z.shape[1] * z.shape[2]
    zc = z.reshape(b, -1) - z.reshape(b, -1).mean(axis=0)      # (b, f) centered
    gram = jnp.matmul(zc, zc.T, preferred_element_type=jnp.float32)  # (b, b)
    denom = (b - 1) ** 2
    fro2 = jnp.sum(jnp.square(gram)) / denom
    row_sq = jnp.einsum("bf,bf->f", zc, zc)                    # per-feature ||·||^2
    diag2 = jnp.sum(jnp.square(row_sq)) / denom
    return (fro2 - diag2) / num_features


# ------------------------------------------------------------------ mixing ---

def get_stems_faders(batch, dl_iter: Iterator, dl, maxstems: int = 2,
                     unity_gain: bool = False, rng: Optional[np.random.Generator] = None,
                     debug: bool = False):
    """Draw extra stems from the dataloader + random faders (reference
    aa_mixer.py:270-292). Host-side; returns (stems [S,B,C,T], faders [S],
    dl_iter). Faders = sign(u)·(1 + 0.5·tanh(2v)) ∈ ±[0.5, 1.5]."""
    rng = rng or np.random.default_rng()
    nstems = int(rng.integers(2, maxstems + 1))
    if debug:
        print("maxstems, nstems =", maxstems, nstems)
    faders = np.sign(2 * rng.random(nstems) - 1)
    if not unity_gain:
        faders += 0.5 * np.tanh(2 * (2 * rng.random(nstems) - 1))
    stems = [np.asarray(batch)]
    for _ in range(nstems - 1):
        try:
            nxt = next(dl_iter)
        except StopIteration:
            dl_iter = iter(dl)
            nxt = next(dl_iter)
        stems.append(np.asarray(nxt))
    return np.stack(stems), faders.astype(np.float32), dl_iter


class AABundle:
    """AudioAlgebra module + params with the reference's object call surface
    (aa_model(y) -> (z, y_recon); .encode/.decode)."""

    def __init__(self, dims: int = 64, hidden_dims: int = 64, use_bn: bool = False,
                 resid: bool = True, trivial: bool = False, seed: int = 0):
        self.module = AudioAlgebra(dims=dims, hidden_dims=hidden_dims,
                                   use_bn=use_bn, resid=resid, trivial=trivial)
        from .utils.prng import host_key
        key = host_key(seed)
        self.params = self.module.init(key, jnp.zeros((1, dims, 4)))
        self._fwd = jax.jit(self.module.apply)
        self._enc = jax.jit(lambda p, x: self.module.apply(p, x, method=AudioAlgebra.encode))
        self._dec = jax.jit(lambda p, x: self.module.apply(p, x, method=AudioAlgebra.decode))

    def __call__(self, y):
        return self._fwd(self.params, y)

    def encode(self, y):
        return self._enc(self.params, y)

    def decode(self, z):
        return self._dec(self.params, z)


def do_mixing(stems, faders, given_model, aa_model, device=None, debug=False,
              **kwargs):
    """Mix stems, encode, re-embed; returns (zsum, zmix, archive)
    (reference aa_mixer.py:295-327). Object-level variant over wrapper +
    bundle; the jitted training path uses make_mixer_loss_fn below."""
    stems = jnp.asarray(stems)                        # (S, B, C, T)
    faders = jnp.asarray(faders)
    fadedstems = stems * faders[:, None, None, None]
    s, b, c, t = fadedstems.shape

    ys = [given_model.encode(fadedstems[i]) for i in range(s)]
    zs, yrecons = [], []
    zsum = None
    for y in ys:
        z, y_recon = aa_model(y)
        zsum = z if zsum is None else zsum + z
        zs.append(z)
        yrecons.append(y_recon)
    mix = fadedstems.sum(axis=0)
    ymix = given_model.encode(mix)
    zmix, ymix_recon = aa_model(ymix)
    ysum = sum(ys[1:], ys[0])
    archive = {'zs': zs, 'mix': mix, 'ys': ys, 'ymix': ymix,
               'ymix_recon': ymix_recon,
               'fadedstems': [fadedstems[i] for i in range(s)],
               'yrecons': yrecons, 'ysum': ysum}
    return zsum, zmix, archive


def make_mixer_loss_fn(aa_module: AudioAlgebra, encode_fn: Callable):
    """Pure jittable loss: (aa_params, stems (S,B,C,T), faders (S,), batch)
    -> (loss, logs). The whole reference training_step
    (train_aa_mixer.py:50-81) as one program: batched stem encode (S folded
    into batch), zsum/zmix VICReg + recon losses."""

    def loss_fn(aa_params, stems, faders, batch):
        s, b, c, t = stems.shape
        faded = stems * faders[:, None, None, None]
        # one batched encode for all stems + the running mix
        mix = faded.sum(axis=0)
        enc_in = jnp.concatenate([faded.reshape(s * b, c, t), mix], axis=0)
        y_all = jax.lax.stop_gradient(encode_fn(enc_in))
        d, n = y_all.shape[-2], y_all.shape[-1]
        z_all, yrec_all = aa_module.apply(aa_params, y_all)
        ys = z_all[: s * b].reshape(s, b, d, n)
        zsum = ys.sum(axis=0)
        zmix = z_all[s * b :]
        ymix, ymix_recon = y_all[s * b :], yrec_all[s * b :]

        mix_loss = mseloss(zsum, zmix)
        var_loss = (vicreg_var_loss(zsum) + vicreg_var_loss(zmix)) / 2
        cov_loss = (vicreg_cov_loss(zsum) + vicreg_cov_loss(zmix)) / 2

        y_batch = jax.lax.stop_gradient(encode_fn(batch))
        _, yrecon = aa_module.apply(aa_params, y_batch)
        aa_recon_loss = mseloss(y_batch, yrecon) + mseloss(ymix, ymix_recon)

        loss = mix_loss + var_loss + cov_loss + aa_recon_loss
        logs = {'train_loss': loss, 'mix_loss': mix_loss,
                'var_loss': var_loss, 'cov_loss': cov_loss,
                'aa_recon_loss': aa_recon_loss}
        return loss, logs

    return loss_fn


def aa_demo(given_model, aa_model, log_dict, zsum, zmix, step: int,
            demo_steps: int = 35, sr: int = 48000, out_dir: str = "."):
    """Decode zsum/zmix back to audio files for logging (reference
    aa_mixer.py:330-341)."""
    from .utils.audio_io import save_audio

    import inspect
    # the wrappers' step-count keyword differs (demo_steps / steps /
    # num_steps; the DSP AEs take none) — pass it where one exists instead
    # of positionally (a TypeError on the **kwargs-only decoders)
    sig = inspect.signature(type(given_model).decode)
    step_kw = next((
        {nm: demo_steps} for nm in ("demo_steps", "steps", "num_steps")
        if nm in sig.parameters), {})
    for var, name in zip([zsum, zmix], ['zsum', 'zmix']):
        y = aa_model.decode(var)
        fake_audio = given_model.decode(y, **step_kw)
        filename = f'{out_dir}/{name}_{step:08}.wav'
        save_audio(filename, np.clip(np.asarray(fake_audio), -1, 1), sr)
        log_dict[name] = filename
    return log_dict


# ---------------------------------------------------------------- training ---

def train_aa_model(given_model, train_dl, args, aa_model: Optional[AABundle] = None,
                   logger=None, debug: bool = False):
    """Train the AA projector (reference aa_mixer.py:367-452): Adam 5e-4 +
    OneCycle(max_lr 1e-3), loss = mix+var+cov+recon. Single-host loop with
    the step jitted end-to-end; multi-device via parallel.train."""
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
    def train_step(params, opt_state, enc_params, stems, faders, batch):
        # the frozen encoder params ride as ARGUMENTS: a closure would bake
        # them into the executable as XLA constants (duplicated HBM, and a
        # post-trace checkpoint pour would silently train against stale
        # weights)
        loss_fn = make_mixer_loss_fn(
            aa_model.module, lambda x: enc.pure(enc_params, x))
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stems, faders, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    rng = np.random.default_rng(seed)
    params, step = aa_model.params, 0
    history = []
    for epoch in range(max_epochs):
        train_iter = iter(train_dl)
        for batch_i, batch in enumerate(train_dl):
            if batch_i >= steps_per_epoch:
                break   # keep the loop on the OneCycle schedule's clock
            batch = np.asarray(batch)
            stems, faders, train_iter = get_stems_faders(
                batch, train_iter, train_dl, maxstems=getattr(args, 'maxstems', 2),
                rng=rng)
            params, opt_state, logs = train_step(
                params, opt_state, enc.get_params(), jnp.asarray(stems),
                jnp.asarray(faders), jnp.asarray(batch))
            logs = {k: float(v) for k, v in logs.items()}
            logs.update(epoch=epoch, step=step,
                        learning_rate=float(sched(step)))
            if logger is not None:
                logger.log(logs)
            history.append(logs)
            step += 1
    aa_model.params = params
    return aa_model, history


def given_model_encode_fn(given_model) -> Callable:
    """Pure (jit-safe) encode closure for a wrapper with flax params.

    Spectrogram AEs encode with pure DSP; model wrappers expose
    (params, module) pairs. The returned `fn(x)` reads the wrapper's
    CURRENT params (fine for eager use); jitted training loops should use
    the attached `fn.pure(params, x)` + `fn.get_params()` pair instead so
    the frozen encoder rides as an argument, not a baked XLA constant.
    """
    def _wrap(pure, get_params):
        def fn(x):
            return pure(get_params(), x)
        fn.pure, fn.get_params = pure, get_params
        return fn

    if hasattr(given_model, 'model') and hasattr(given_model, 'params_ema'):
        mdl = given_model.model
        given_model._ensure_params()
        return _wrap(
            lambda p, x: mdl.apply(p, x, method=type(mdl).encode_it),
            lambda: given_model.params_ema)
    if hasattr(given_model, 'model') and hasattr(given_model, 'params'):
        mdl = given_model.model
        given_model._ensure_params()
        return _wrap(lambda p, x: mdl.apply(p, x, method=type(mdl).encode),
                     lambda: given_model.params)
    # pure-DSP encoders have no params: thread an empty pytree
    return _wrap(lambda p, x: given_model.encode(x), lambda: ())
