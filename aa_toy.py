#!/usr/bin/env python
"""aa-mixer toy — 2-D synthetic study of the mixer-algebra training.

Script rebuild of the reference's aa-mixer-toy.ipynb (77 cells), the
scientific test harness for the whole idea: a frozen NONLINEAR 2-D encoder
("TwistAndScrunch": radius-dependent rotation + tanh compression, cells
20-23) breaks vector addition; training the AudioAlgebra map h with the
VICReg objective restores it (zsum covers zmix, cell 58), enabling
king−man+woman arithmetic (cells 69-73) and demixing (cell 75).

Run as a script for the full study with saved plots-data; the pytest suite
runs a shortened version asserting the algebra error actually drops.
"""
from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np


def rand_vec_batch(rng: np.random.Generator, n: int, extent: float = 1.0) -> np.ndarray:
    """RandVecDataset equivalent (reference cell 10): uniform 2-D points."""
    return (rng.random((n, 2), dtype=np.float32) * 2 - 1) * extent


def twist_and_scrunch(x, twist: float = 1.5, scrunch: float = 1.2):
    """Frozen nonlinear 'given encoder' (reference cells 20-23): rotate each
    point by an angle proportional to its radius, then tanh-compress."""
    import jax.numpy as jnp

    r = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ang = twist * r
    c, s = jnp.cos(ang)[..., 0], jnp.sin(ang)[..., 0]
    rot = jnp.stack([c * x[..., 0] - s * x[..., 1],
                     s * x[..., 0] + c * x[..., 1]], axis=-1)
    return jnp.tanh(scrunch * rot)


def train_toy(steps: int = 2000, batch: int = 256, hidden: int = 64,
              seed: int = 42, lr: float = 2e-3, log_every: int = 200,
              logger=None):
    """Train h on the toy mixer objective; returns (bundle, history)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn
    from audio_algebra_tpu.models.aa import _MLP

    class ToyAA(nn.Module):
        hidden: int = 64

        def setup(self):
            self.enc = _MLP(2, self.hidden, resid=True, use_bn=False)
            self.dec = _MLP(2, self.hidden, resid=True, use_bn=False)

        def encode(self, y):
            return self.enc(y) + y

        def decode(self, z):
            return self.dec(z) + z

        def __call__(self, y):
            z = self.encode(y)
            return z, self.decode(z)

    model = ToyAA(hidden=hidden)
    from audio_algebra_tpu.utils.prng import host_key
    key = host_key(seed)
    params = model.init(key, jnp.zeros((1, 2)))

    def loss_fn(p, a, b, fa, fb):
        ya = twist_and_scrunch(a * fa)
        yb = twist_and_scrunch(b * fb)
        ymix = twist_and_scrunch(a * fa + b * fb)
        za, ya_rec = model.apply(p, ya)
        zb, yb_rec = model.apply(p, yb)
        zmix, ymix_rec = model.apply(p, ymix)
        zsum = za + zb
        mix_loss = jnp.mean((zsum - zmix) ** 2)
        std = jnp.sqrt(zsum.var(axis=0) + 1e-4)
        var_loss = jnp.mean(jax.nn.relu(1.0 - std))
        zc = zsum - zsum.mean(axis=0)
        cov = (zc.T @ zc) / (zsum.shape[0] - 1)
        cov_loss = (cov[0, 1] ** 2) / 2
        recon = jnp.mean((ya_rec - ya) ** 2) + jnp.mean((ymix_rec - ymix) ** 2)
        loss = mix_loss + 0.1 * var_loss + 0.1 * cov_loss + recon
        return loss, {"mix_loss": mix_loss, "recon": recon}

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, a, b, fa, fb):
        (l, logs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, a, b, fa, fb)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l, logs

    rng = np.random.default_rng(seed)
    history = []
    for i in range(steps):
        a = rand_vec_batch(rng, batch, 0.6)
        b = rand_vec_batch(rng, batch, 0.6)
        fa, fb = (np.float32(rng.uniform(0.5, 1.0)) for _ in range(2))
        params, opt_state, loss, logs = step(params, opt_state,
                                             jnp.asarray(a), jnp.asarray(b),
                                             fa, fb)
        if i % log_every == 0 or i == steps - 1:
            rec = {"step": i, "loss": float(loss),
                   **{k: float(v) for k, v in logs.items()}}
            history.append(rec)
            if logger:
                logger.log(rec, step=i)
    return (model, params), history


def algebra_error(model, params, n: int = 512, seed: int = 1) -> dict:
    """Measure zsum-vs-zmix error through h vs through the raw encoder."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    a = jnp.asarray(rand_vec_batch(rng, n, 0.6))
    b = jnp.asarray(rand_vec_batch(rng, n, 0.6))
    ya, yb, ymix = (twist_and_scrunch(v) for v in (a, b, a + b))
    raw_err = float(jnp.mean((ya + yb - ymix) ** 2))
    za = model.apply(params, ya, method=type(model).encode)
    zb = model.apply(params, yb, method=type(model).encode)
    zmix = model.apply(params, ymix, method=type(model).encode)
    z_err = float(jnp.mean((za + zb - zmix) ** 2))
    return {"raw_err": raw_err, "z_err": z_err, "improvement": raw_err / max(z_err, 1e-12)}


def kmw_demo(model, params, seed: int = 2) -> dict:
    """king − man + woman in z-space (reference cells 69-73)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    king, man = (jnp.asarray(rand_vec_batch(rng, 1, 0.5)) for _ in range(2))
    woman = jnp.asarray(rand_vec_batch(rng, 1, 0.5))
    queen = king - man + woman                      # ground truth in input space
    enc = lambda v: model.apply(params, twist_and_scrunch(v),
                                method=type(model).encode)
    z_guess = enc(king) - enc(man) + enc(woman)
    z_true = enc(queen)
    return {"kmw_err": float(jnp.mean((z_guess - z_true) ** 2))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--out-dir", default="aa_toy_out")
    args = p.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (model, params), history = train_toy(steps=args.steps)
    err = algebra_error(model, params)
    kmw = kmw_demo(model, params)
    print(json.dumps({**err, **kmw, "final_loss": history[-1]["loss"]}, indent=2))
    with open(out / "results.json", "w") as f:
        json.dump({"history": history, **err, **kmw}, f, indent=2)


if __name__ == "__main__":
    main()
