#!/usr/bin/env python
"""Benchmark the MIRAGE generation pipeline at the reference's production
config (reference mirage.py:264-266: 150 inner CFG latent-diffusion steps +
100 outer v-DDIM steps, 22 s of 48 kHz audio per batch item).

Random weights (the multi-GB pretrained checkpoints aren't fetchable
here) — identical FLOPs/traffic to the real model. Prints realtime
factors per stage and end-to-end; results recorded in BASELINE.md.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner-steps", type=int, default=150)
    ap.add_argument("--outer-steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="bf16 = the app's serving default (half)")
    ap.add_argument("--model-len", default="22s", choices=["22s", "66s"],
                    help="generation window (reference given_models.py:696-698)")
    ap.add_argument("--compare-turbo", action="store_true",
                    help="after the main timing, re-run the SAME-seed "
                         "generation with AA_TURBO_INT8=1 (the folded int8 "
                         "on-ramp at small batch) and report realtime + "
                         "rel RMS vs the bf16 output")
    args = ap.parse_args()

    import jax
    from audio_algebra_tpu.utils.profiling import wait_for_backend
    wait_for_backend()
    import jax.numpy as jnp
    from audio_algebra_tpu.given_models import CLAPDAE

    w = CLAPDAE(debug=False)
    w.setup(gdrive=False, model_len=args.model_len)
    if args.dtype == "bf16":
        w.half()

    from audio_algebra_tpu.utils.prng import host_key
    emb = jax.random.normal(host_key(0), (args.batch, 1, 512))

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    def timed(seed=1234):
        """One compile pass + timed iters, each generate from a FIXED key
        so precision configs draw identical noise (comparable outputs)."""
        w._key = host_key(seed)
        t0 = time.time()
        out, _ = w.generate(emb, demo_steps=args.inner_steps,
                            outer_steps=args.outer_steps,
                            batch_size=args.batch)
        fetch(out)
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            w._key = host_key(seed)
            out, _ = w.generate(emb, demo_steps=args.inner_steps,
                                outer_steps=args.outer_steps,
                                batch_size=args.batch)
            fetch(out)
        return (time.time() - t0) / args.iters, comp, out

    dt, compile_s, fakes = timed()

    audio_sec = args.batch * w.sample_size / 48000
    st = getattr(w, "last_stage_times", None)
    if st:
        print(f"# stage times (last iter): inner {st['inner_s']:.2f}s, "
              f"outer+AE {st['outer_s']:.2f}s", file=sys.stderr)
    ms = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if ms and ms.get("bytes_limit"):
        peak, lim = ms.get("peak_bytes_in_use", 0), ms["bytes_limit"]
        print(f"# HBM peak {peak/2**30:.2f} GiB of {lim/2**30:.2f} GiB "
              f"({100*peak/lim:.0f}%)", file=sys.stderr)
    import os
    eff_dtype = args.dtype
    if os.environ.get("AA_TURBO_INT8") == "1":
        eff_dtype += "_turboint8"      # never mislabel the int8 dial as bf16
    print(json.dumps({
        "metric": f"mirage_generate_rt_{args.inner_steps}i_"
                  f"{args.outer_steps}o_{eff_dtype}"
                  + ("_66s" if args.model_len == "66s" else ""),
        "value": round(audio_sec / dt, 2), "unit": "x_realtime_per_chip",
        "note": f"{dt:.1f}s per {audio_sec:.1f}s of audio; "
                f"compile {compile_s:.0f}s"}))
    print(f"# batch={args.batch} sample_size={w.sample_size} "
          f"inner={args.inner_steps} outer={args.outer_steps}",
          file=sys.stderr)

    if args.compare_turbo and os.environ.get("AA_TURBO_INT8") != "1":
        os.environ["AA_TURBO_INT8"] = "1"
        try:
            dt_t, compile_t, fakes_t = timed()
        finally:
            os.environ.pop("AA_TURBO_INT8", None)
        rt_t = audio_sec / dt_t
        err = float(jnp.sqrt(
            jnp.mean(jnp.square(fakes_t.astype(jnp.float32)
                                - fakes.astype(jnp.float32)))
            / jnp.maximum(jnp.mean(jnp.square(fakes.astype(jnp.float32))),
                          1e-12)))
        print(json.dumps({
            "metric": f"mirage_generate_rt_{args.inner_steps}i_"
                      f"{args.outer_steps}o_{args.dtype}_turboint8"
                      + ("_66s" if args.model_len == "66s" else ""),
            "value": round(rt_t, 2), "unit": "x_realtime_per_chip",
            "note": f"{dt_t:.1f}s per {audio_sec:.1f}s of audio; "
                    f"compile {compile_t:.0f}s; rel RMS vs bf16 same-seed "
                    f"output {err:.4f}"}))


if __name__ == "__main__":
    main()
