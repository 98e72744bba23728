#!/usr/bin/env python
"""The profiler for this repo's hot paths — one tool, subcommands.

Replaces the round-1 profile_unet{,2..7,_turbo}.py / profile_gn_ab.py
family (measurement history preserved in docs/performance.md). Ground
rules learned there: single-dispatch timings over the axon relay carry a
~20-30 ms fetch floor, so `forward` times the forward inside a fori_loop
(amortized, trustworthy to <5%); `trace` captures xprof and prints XLA's
own per-op accounting (the only per-op ground truth).

Targets (`--model`):
  dvae-unet   decode-UNet forward, the Destructo hot loop (B=16 default)
  dvae-enc    SoundStreamXL encoder (corpus-extraction config)
  ldm         MIRAGE inner UNetCFG1d forward incl. CFG (B=1 default)
  outer       MIRAGE outer stacked-diffae diffusion_v (B=1 default)

Subcommands:
  forward     amortized ms/forward via an N-iteration on-device loop
  trace       xprof trace (forward or a sampler loop via --steps) ->
              /tmp/aa_hlo_stats.out + a per-category summary
  levels      per-level cost of the dvae decode UNet by depth truncation

Env knobs still apply (AA_TURBO_INT8, AA_GN_*), so A/B runs are two
invocations with different envs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import argparse
import collections
import glob
import json
import shutil
import time


def _fetch(v) -> float:
    """Force a real device-to-host fetch. block_until_ready does NOT await
    remote completion on the axon relay (measured: an 8.5 s loop
    "completes" in 0.1 ms) — every timing in this tool must end with this,
    and ONLY this (keep the rule in one place)."""
    import jax.numpy as jnp
    return float(jnp.abs(jnp.ravel(v)[:8]).sum())


def _setup_jax():
    import jax
    from audio_algebra_tpu.utils.profiling import wait_for_backend
    wait_for_backend()    # cache config + bounded retry on relay flake
    return jax


def build_target(model: str, batch: int, dtype_str: str):
    """Returns (fn, args, meta) with fn jittable: fn(*args) -> array."""
    import jax
    import jax.numpy as jnp

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_str]
    key = jax.random.PRNGKey(0)

    if model in ("dvae-unet", "dvae-enc"):
        from audio_algebra_tpu.models.dvae import DiffusionDVAE
        from audio_algebra_tpu.utils.params import fast_random_params
        m = DiffusionDVAE()
        params = fast_random_params(m, 0, jnp.zeros((1, 2, 65536)),
                                    jnp.zeros((1,)))
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        x = jax.random.normal(key, (batch, 2, 65536), dtype)
        if model == "dvae-enc":
            return (lambda p, a: m.apply(p, a, method=DiffusionDVAE.encode),
                    (params, x), {"audio_sec": batch * 65536 / 48000})
        t = jnp.full((batch,), 0.5, dtype)
        cond = jax.random.normal(key, (batch, 64, 512), dtype)
        return (lambda p, a, b, c: m.apply(p, a, b, c,
                                           method=DiffusionDVAE.decode_v),
                (params, x, t, cond), {"audio_sec": batch * 65536 / 48000})

    from audio_algebra_tpu.given_models import CLAPDAE
    w = CLAPDAE(debug=False)
    w._ensure_params()
    cast = lambda tr: jax.tree_util.tree_map(lambda a: a.astype(dtype), tr)
    if model == "ldm":
        params = cast(w.ldm_params)
        z = jax.random.normal(key, (batch, w.latent_dim, 2048), dtype)
        t = jnp.full((batch,), 0.5, dtype)
        emb = jax.random.normal(key, (batch, 1, 512), dtype)
        return (lambda p, a, b, e: w.latent_diffusion_model.apply(
                    p, a, b, embedding=e, embedding_scale=4.0),
                (params, z, t, emb),
                {"audio_sec": batch * 1048576 / 48000})
    if model == "outer":
        from audio_algebra_tpu.models.stacked import \
            LatentAudioDiffusionAutoencoder
        params = cast(w.diffae_params)
        x = jax.random.normal(key, (batch, 32, 32768), dtype)
        t = jnp.full((batch,), 0.5, dtype)
        cond = jax.random.normal(key, (batch, 32, 2048), dtype)
        return (lambda p, a, b, c: w.latent_diffae.apply(
                    p, a, b, c,
                    method=LatentAudioDiffusionAutoencoder.diffusion_v),
                (params, x, t, cond),
                {"audio_sec": batch * 1048576 / 48000})
    if model == "outer-fold":
        # the sequence-folded B=1 serving path (parallel/fold.py)
        from audio_algebra_tpu.parallel.fold import decode_unet_seqfold
        la = w.latent_diffae
        params = cast(w.diffae_params)
        x = jax.random.normal(key, (batch, 32, 32768), dtype)
        t = jnp.full((batch,), 0.5, dtype)
        cond = jax.random.normal(key, (batch, 32, 2048), dtype)
        ucfg = dict(io_channels=la.latent_dim,
                    cond_dim=la.second_stage_latent_dim,
                    n_attn_layers=0, c_mults=tuple(la.diffusion_c_mults),
                    depth=la.diffusion_depth)
        return (lambda p, a, b, c: decode_unet_seqfold(
                    p["params"]["diffusion"], a, b, c, **ucfg),
                (params, x, t, cond),
                {"audio_sec": batch * 1048576 / 48000})
    raise SystemExit(f"unknown --model {model}")


def build_loop(model: str, batch: int, dtype_str: str, steps: int,
               model_len: str = "22s"):
    """A sampler loop target for `trace --steps N` (the in-loop program
    is what production runs; its op accounting can differ from the
    standalone forward)."""
    import jax
    import jax.numpy as jnp
    from audio_algebra_tpu.given_models import CLAPDAE
    from audio_algebra_tpu.samplers.kdiff import kdiff_sample
    from audio_algebra_tpu.samplers.vddim import sample as vddim_sample

    key = jax.random.PRNGKey(0)
    if model in ("dvae-unet",):
        fn, (params, x, t, cond), meta = build_target(model, batch, dtype_str)
        return (lambda: vddim_sample(lambda a, b, cond: fn(params, a, b, cond),
                                     x, steps, 0, cond, key=key), meta)
    w = CLAPDAE(debug=False)
    w.setup(gdrive=False, model_len=model_len)
    if dtype_str == "bf16":
        w.half()
    # latent frames for the window: 22 s -> 2048, 66 s -> 6144
    n_lat = w.demo_samples // w.downsampling_ratio
    if model == "ldm":
        import os
        emb = jax.random.normal(key, (batch, 1, 512))
        z = jax.random.normal(key, (batch, w.latent_dim, n_lat))
        if dtype_str == "bf16":
            emb, z = emb.astype(jnp.bfloat16), z.astype(jnp.bfloat16)

        def loop():
            rb = None
            if os.environ.get("AA_RELPOS_HOIST", "1") == "1":
                from audio_algebra_tpu.models.unet_cfg1d import \
                    precompute_rel_biases
                rb = precompute_rel_biases(
                    w.latent_diffusion_model,
                    w.ldm_params["params"]["diffusion"], z.shape[-1])
            ldm = lambda a, b, embedding: w.latent_diffusion_model.apply(
                w.ldm_params, a, b, embedding=embedding,
                embedding_scale=4.0, rel_biases=rb)
            return kdiff_sample(ldm, z, steps, embedding=emb)

        return (loop, {"audio_sec": batch * 1048576 / 48000})
    if model == "outer":
        from audio_algebra_tpu.models.stacked import \
            LatentAudioDiffusionAutoencoder
        r1 = w.latent_diffae.latent_downsampling_ratio
        noise = jax.random.normal(key, (batch, 32, n_lat * r1))
        cond = jnp.clip(jax.random.normal(key, (batch, 32, n_lat)), -1, 1)
        if dtype_str == "bf16":
            noise = noise.astype(jnp.bfloat16)
            cond = cond.astype(jnp.bfloat16)
        s1 = lambda a, b, cond: w.latent_diffae.apply(
            w.diffae_params, a, b, cond,
            method=LatentAudioDiffusionAutoencoder.diffusion_v)
        return (lambda: vddim_sample(s1, noise, steps, 0, cond, key=key),
                {"audio_sec": batch * 1048576 / 48000})
    raise SystemExit(f"--steps unsupported for --model {model}")


def cmd_forward(args):
    jax = _setup_jax()
    import jax.numpy as jnp

    fn, fargs, meta = build_target(args.model, args.batch, args.dtype)
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*fargs))

    # amortized: N chained forwards inside one dispatched loop. The params
    # and trailing args MUST be loop arguments, not closure captures — a
    # capture embeds them as HLO constants and the multi-GB compile request
    # blows the axon relay's body-size cap (HTTP 413).
    chain = (getattr(out, "shape", None) == fargs[1].shape
             and getattr(out, "dtype", None) == fargs[1].dtype)

    def loop(p, x0, rest):
        def body(_, x):
            # chain the output back in when shapes allow — a
            # `x + 0 * y.sum()` pseudo-dep gets constant-folded and XLA
            # DCEs the entire forward (measured: 0.16 "ms/forward")
            y = jfn(p, x, *rest)
            if chain:
                return y
            # shape-changing targets (dvae-enc): perturb the carry by
            # tiny*out[0] — data-dependent and nonzero-scaled, so XLA can
            # neither fold it nor DCE the forward, and the value drift
            # over any iteration count is ~1e-38 per step
            eps = jnp.asarray(jnp.finfo(jnp.float32).tiny, x0.dtype)
            return x + (jnp.ravel(y)[0].astype(x0.dtype) * eps)
        return jax.lax.fori_loop(0, args.iters, body, x0)

    lfn = jax.jit(loop)

    _fetch(lfn(fargs[0], fargs[1], fargs[2:]))
    t0 = time.perf_counter()
    _fetch(lfn(fargs[0], fargs[1], fargs[2:]))
    per = (time.perf_counter() - t0) / args.iters * 1e3
    print(json.dumps({"model": args.model, "batch": args.batch,
                      "dtype": args.dtype, "ms_per_forward": round(per, 2),
                      "iters": args.iters}))


def summarize_hlo_stats(path: str, top: int = 12):
    d = json.loads(open(path, "rb").read().decode())
    cols = [c["id"] for c in d["cols"]]
    ix = {k: cols.index(k) for k in
          ("program_id", "category", "hlo_op_name", "occurrences",
           "total_self_time", "bound_by")}
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
    by_prog = collections.defaultdict(
        lambda: collections.defaultdict(float))
    tot = collections.defaultdict(float)
    for r in rows:
        p, cat = r[ix["program_id"]], r[ix["category"]]
        t = float(r[ix["total_self_time"]] or 0)
        by_prog[p][cat] += t
        tot[p] += t
    for p in sorted(tot, key=lambda q: -tot[q]):
        if tot[p] < 100:   # skip noise programs (<0.1 ms)
            continue
        print(f"== program {p}: total {tot[p]/1e3:.1f} ms ==")
        for cat, t in sorted(by_prog[p].items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {cat:40s} {t/1e3:8.2f} ms")
    return by_prog, tot, (rows, ix)


def cmd_trace(args):
    jax = _setup_jax()
    import jax.numpy as jnp

    if args.steps:
        run, _ = build_loop(args.model, args.batch, args.dtype, args.steps,
                            getattr(args, "model_len", "22s"))
    else:
        fn, fargs, _ = build_target(args.model, args.batch, args.dtype)
        jfn = jax.jit(fn)
        run = lambda: jfn(*fargs)

    fetch = _fetch
    fetch(run())                      # compile outside the trace
    t0 = time.perf_counter()
    fetch(run())
    wall = (time.perf_counter() - t0) * 1e3
    print(f"wall: {wall:.1f} ms"
          + (f" ({wall/args.steps:.1f} ms/step)" if args.steps else ""))

    logdir = "/tmp/aa_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            fetch(run())
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise SystemExit("no xplane captured")
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats^", {})
    out = "/tmp/aa_hlo_stats.out"
    with open(out, "wb" if isinstance(data, bytes) else "w") as fh:
        fh.write(data)
    print(f"hlo_stats -> {out}  (reps={args.reps}; divide by reps)")
    summarize_hlo_stats(out)


def cmd_train_trace(args):
    """xprof the CLAPDAE generator TRAIN step (the bench_train step
    verbatim: v-objective + CFG dropout + Adam + EMA) — the trace behind
    training-MFU statements. AA_TRAIN_FLASH / AA_LDM_REMAT apply."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np
    import optax
    from audio_algebra_tpu.models.stacked import (
        StackedAELatentDiffusionCond, v_objective_loss)
    from audio_algebra_tpu.models.ema import EMASchedule
    from audio_algebra_tpu.utils.params import fast_random_params
    from audio_algebra_tpu.utils.prng import host_key

    ldm = StackedAELatentDiffusionCond()
    lat_shape = (args.batch, 32, 2048)
    params = fast_random_params(
        ldm, 0, jnp.zeros((1,) + lat_shape[1:]), jnp.zeros((1,)),
        embedding=jnp.zeros((1, 1, 512)))
    opt = optax.adam(4e-5)
    opt_state = opt.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params)
    ema_sched = EMASchedule(beta=0.9999, power=0.75)

    def model_apply(p, x, t, **kw):
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
        return ldm.apply(pb, x.astype(jnp.bfloat16), t,
                         **kw).astype(jnp.float32)

    def step_fn(params, ema_params, opt_state, step_idx, latents, emb, t,
                noise, key):
        def loss_fn(p):
            return v_objective_loss(model_apply, p, latents, emb, t, noise,
                                    key, embedding_mask_proba=0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_sched.update(params, ema_params, step_idx)
        return params, ema_params, opt_state, loss

    jitted = jax.jit(step_fn, donate_argnums=(0, 1, 2))
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal(lat_shape), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((args.batch, 1, 512)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (args.batch,)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(lat_shape), jnp.float32)
    key = host_key(1)
    state = (params, ema_params, opt_state)

    def run(state, i):
        p, e, o, loss = jitted(*state, i, latents, emb, t, noise, key)
        _fetch(loss)
        return (p, e, o)

    state = run(state, 0)                      # compile outside the trace
    t0 = time.perf_counter()
    state = run(state, 1)
    print(f"wall: {(time.perf_counter() - t0) * 1e3:.1f} ms/step "
          f"(batch {args.batch})")
    logdir = "/tmp/aa_train_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for i in range(args.reps):
            state = run(state, 2 + i)
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise SystemExit("no xplane captured")
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats^", {})
    out = "/tmp/aa_train_hlo_stats.out"
    with open(out, "wb" if isinstance(data, bytes) else "w") as fh:
        fh.write(data)
    print(f"hlo_stats -> {out}  (reps={args.reps}; divide by reps)")
    summarize_hlo_stats(out)


def cmd_levels(args):
    """Depth-truncated decode-UNet: cost of each resolution level."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from audio_algebra_tpu.models.unet1d import DiffusionAttnUnet1D
    from audio_algebra_tpu.utils.params import fast_random_params

    full = 14
    prev = None
    for depth in range(args.min_depth, full + 1):
        c_mults = ([256, 256] + [512] * 12)[:depth]
        m = DiffusionAttnUnet1D(io_channels=2, cond_dim=64,
                                n_attn_layers=4, c_mults=tuple(c_mults))
        params = fast_random_params(m, 0, jnp.zeros((1, 2, 65536)),
                                    jnp.zeros((1,)),
                                    jnp.zeros((1, 64, 512)))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (args.batch, 2, 65536), jnp.bfloat16)
        t = jnp.full((args.batch,), 0.5, jnp.bfloat16)
        cond = jax.random.normal(jax.random.PRNGKey(1),
                                 (args.batch, 64, 512), jnp.bfloat16)
        f = jax.jit(lambda p, a, b, c: m.apply(p, a, b, c))
        # fetch, not block_until_ready — the relay's block is a no-op
        fetch = _fetch
        fetch(f(params, x, t, cond))
        t0 = time.perf_counter()
        for _ in range(3):
            fetch(f(params, x, t, cond))
        ms = (time.perf_counter() - t0) / 3 * 1e3
        delta = "" if prev is None else f"  (+{ms - prev:.1f})"
        print(f"depth {depth:2d}: {ms:7.1f} ms{delta}", flush=True)
        prev = ms


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    fwd = sub.add_parser("forward", help="amortized ms/forward")
    fwd.add_argument("--model", default="dvae-unet")
    fwd.add_argument("--batch", type=int, default=None)
    fwd.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    fwd.add_argument("--iters", type=int, default=10)
    fwd.set_defaults(func=cmd_forward)

    tr = sub.add_parser("trace", help="xprof trace + hlo_stats summary")
    tr.add_argument("--model", default="dvae-unet")
    tr.add_argument("--batch", type=int, default=None)
    tr.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    tr.add_argument("--steps", type=int, default=0,
                    help="trace an N-step sampler loop instead of one fwd")
    tr.add_argument("--reps", type=int, default=2)
    tr.add_argument("--model-len", default="22s", choices=["22s", "66s"],
                    help="generation window for ldm/outer loop targets")
    tr.set_defaults(func=cmd_trace)

    tt = sub.add_parser("train-trace",
                        help="xprof the CLAPDAE generator train step")
    tt.add_argument("--batch", type=int, default=16)
    tt.add_argument("--reps", type=int, default=2)
    tt.set_defaults(func=cmd_train_trace)

    lv = sub.add_parser("levels", help="per-level decode-UNet cost")
    lv.add_argument("--batch", type=int, default=16)
    lv.add_argument("--min-depth", type=int, default=10)
    lv.set_defaults(func=cmd_levels)

    args = ap.parse_args()
    if getattr(args, "batch", None) is None:
        args.batch = 16 if args.model.startswith("dvae") else 1
    args.func(args)


if __name__ == "__main__":
    main()
