#!/usr/bin/env python
"""Corpus-scale effect-direction PCA over DVAE embeddings.

Rebuild of reference calc_effects_pca.py: stream batches -> encode ->
rearrange 'b d n -> d (b n)' -> accumulate the covariance numerator
Σ cov·(n−1) -> eigendecompose (descending) -> log eigenvalues per step
(reference calc_effects_pca.py:76-94, sorted_eig :39-43).

TPU redesign: the running covariance accumulates ON DEVICE inside the same
jit program as the encoder forward (one (d, N)·(N, d) matmul per batch —
no host round trip of embeddings); only the (d, d) matrix comes back for
the eigendecomposition.
"""
from __future__ import annotations

import json

import numpy as np

from audio_algebra_tpu.config import get_all_args
from audio_algebra_tpu.utils.logging import RunLogger


def sorted_eig(cov: np.ndarray):
    """Descending eigendecomposition (reference calc_effects_pca.py:39-43)."""
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order]


def make_streaming_cov_step(encode_fn, mesh=None):
    """jitted: (cov_num, mean_num, count, batch) -> updated accumulators.

    Accumulates Σ x x^T and Σ x so the final covariance is exact (two-pass-
    free): cov = (Σxx^T − N μμ^T)/(N−1). With a mesh, the batch shards over
    the 'data' axis (each device encodes its shard; the (d,d) partial
    products all-reduce via the sharding — corpus-scale extraction rides
    ICI, per the north-star).
    """
    import jax
    import jax.numpy as jnp

    # frozen encoder params ride as a step ARGUMENT (not trace-time baked
    # XLA constants — see given_model_encode_fn's docstring); plain
    # encode closures without the .pure protocol still work
    pure = getattr(encode_fn, "pure", lambda p, x: encode_fn(x))
    get_params = getattr(encode_fn, "get_params", lambda: ())

    def step(cov_num, mean_num, count, enc_params, batch):
        ys = pure(enc_params, batch)                # (b, d, n)
        b, d, n = ys.shape
        flat = jnp.swapaxes(ys, 0, 1).reshape(d, b * n)   # 'b d n -> d (b n)'
        cov_num = cov_num + jnp.matmul(flat, flat.T,
                                       preferred_element_type=jnp.float32)
        mean_num = mean_num + flat.sum(axis=1)
        count = count + b * n
        return cov_num, mean_num, count

    if mesh is None:
        jitted = jax.jit(step)

        def run(cov_num, mean_num, count, batch):
            return jitted(cov_num, mean_num, count, get_params(), batch)
        return run

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", None, None))
    jitted = jax.jit(step, in_shardings=(repl, repl, repl, repl, batch_sh),
                     out_shardings=(repl, repl, repl))

    def run(cov_num, mean_num, count, batch):
        batch = jax.device_put(jnp.asarray(batch), batch_sh)
        return jitted(cov_num, mean_num, count, get_params(), batch)

    return run


def finalize_cov(cov_num, mean_num, count) -> np.ndarray:
    cov_num, mean_num = np.asarray(cov_num, np.float64), np.asarray(mean_num, np.float64)
    n = float(count)
    mu = mean_num / n
    return (cov_num - n * np.outer(mu, mu)) / (n - 1)


def main():
    args = get_all_args(defaults_file="bdct-chunk-pca.ini")
    import jax.numpy as jnp

    from audio_algebra_tpu.datasets import AudioDataset, DataLoader
    from audio_algebra_tpu.given_models import DVAEWrapper
    from audio_algebra_tpu.aa_mixer import given_model_encode_fn

    print(f"args = {args}")
    train_set = AudioDataset([args.training_dir], sample_rate=args.sample_rate,
                             sample_size=args.sample_size,
                             random_crop=args.random_crop, load_frac=args.load_frac)
    train_dl = DataLoader(train_set, batch_size=args.batch_size, shuffle=True,
                          num_workers=min(args.num_workers, 4))

    model_kwargs = None
    if getattr(args, "model_config", ""):
        model_kwargs = json.load(open(args.model_config))
    given_model = DVAEWrapper(args_dict={'sample_size': args.sample_size,
                                         'latent_dim': args.latent_dim},
                              model_kwargs=model_kwargs)
    given_model.setup(gdrive=False)

    logger = RunLogger(project='aa-dvae-pca', config=args.to_dict())
    d = args.latent_dim
    cov_num = jnp.zeros((d, d))
    mean_num = jnp.zeros((d,))
    count = jnp.zeros(())
    import jax
    from audio_algebra_tpu.parallel import make_mesh
    n_dev = min(args.num_gpus if args.num_gpus > 0 else 1, len(jax.devices()))
    mesh = make_mesh(n_devices=n_dev) if n_dev > 1 else None
    step_fn = make_streaming_cov_step(given_model_encode_fn(given_model), mesh)

    for i, batch in enumerate(train_dl):
        cov_num, mean_num, count = step_fn(cov_num, mean_num, count,
                                           jnp.asarray(batch))
        cov = finalize_cov(cov_num, mean_num, count)
        vals, vecs = sorted_eig(cov)
        logger.log({f"lambda{j:02d}": float(vals[j]) for j in range(d)}, step=i)
        print(f"step {i}: top eigenvalues {vals[:4]}")

    cov = finalize_cov(cov_num, mean_num, count)
    vals, vecs = sorted_eig(cov)
    np.save(logger.dir / "cov.npy", cov)
    np.save(logger.dir / "eigvals.npy", vals)
    np.save(logger.dir / "eigvecs.npy", vecs)
    print(json.dumps({"top_eigenvalues": vals[:8].tolist()}))
    logger.finish()


if __name__ == "__main__":
    main()
