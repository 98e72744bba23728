#!/usr/bin/env python
"""Down+up segment experiments: find what forces the layout ping-pong.

Segment = level block -> downsample -> bottleneck block -> upsample ->
skip join -> level block, at (65536, 256) with 512-ch bottleneck, matching
the real UNet's top. Variants:

  A. current ops (depthwise-conv resample, concatenate skip join)
  B. elementwise resample (strided slices / interleave; no depthwise conv)
  C. split-kernel skip join (conv(h,W1)+conv(s,W2); no concatenate)
  D. B + C
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    bsz, K = args.batch, args.reps
    t_len, c = 65536, 256

    def fetch(v):
        return float(jnp.abs(jnp.ravel(v)[:8]).sum())

    def timed(f, *xs):
        fetch(f(*xs))
        t0 = time.time()
        for _ in range(3):
            fetch(f(*xs))
        return (time.time() - t0) / 3

    def bench(name, op, x):
        def looped(n):
            return jax.jit(lambda x: jax.lax.fori_loop(
                0, n, lambda i, h: op(h).astype(h.dtype), x))
        dt = max((timed(looped(K), x) - timed(looped(0), x)) / K, 1e-9)
        print(f"{name:<44s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    w_a = jax.random.normal(key, (5, c, c), dtype) * 0.02       # level conv
    w_b = jax.random.normal(key, (5, c, c), dtype) * 0.02
    w_up1 = jax.random.normal(key, (5, 2 * c, c), dtype) * 0.02  # up conv in
    g = jnp.ones((c,), dtype); b = jnp.zeros((c,), dtype)

    def gn(h):
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(h32), axis=(1, 2), keepdims=True) - mu * mu
        return ((h32 - mu) * jax.lax.rsqrt(var + 1e-5) * g.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(h.dtype)

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))

    def block(h, w1, w2):
        y = nn.gelu(gn(conv(h, w1)))
        y = nn.gelu(gn(conv(y, w2)))
        return h + y

    # resample variants
    def ds_conv(h):
        cc = h.shape[-1]
        k = (jnp.array([1., 3., 3., 1.]) / 8.).astype(h.dtype)
        kern = jnp.broadcast_to(k[:, None, None], (4, 1, cc))
        return jax.lax.conv_general_dilated(
            h, kern, (2,), [(1, 1)], feature_group_count=cc,
            dimension_numbers=("NHC", "HIO", "NHC"))

    def us_conv(h):
        cc = h.shape[-1]
        k = (jnp.array([1., 3., 3., 1.]) / 4.).astype(h.dtype)
        kern = jnp.broadcast_to(k[:, None, None], (4, 1, cc))
        return jax.lax.conv_general_dilated(
            h, kern, (1,), [(2, 2)], lhs_dilation=(2,),
            feature_group_count=cc, dimension_numbers=("NHC", "HIO", "NHC"))

    def ds_elem(h):
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        return (hp[:, 0:-3:2] + 3 * hp[:, 1:-2:2]
                + 3 * hp[:, 2:-1:2] + hp[:, 3::2]) / 8

    def us_elem(h):
        # transposed [1,3,3,1]/4 stride 2 == interleave of two taps
        bb, tt, cc = h.shape
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        even = (hp[:, :-2] + 3 * hp[:, 1:-1]) / 4     # y[2t] = (x[t-1]+3x[t])/4
        odd = (3 * hp[:, 1:-1] + hp[:, 2:]) / 4       # y[2t+1] = (3x[t]+x[t+1])/4
        return jnp.stack([even, odd], axis=2).reshape(bb, 2 * tt, cc)

    # verify elementwise resamples match the conv versions
    xt = jax.random.normal(key, (2, 64, 8), jnp.float32)
    assert jnp.allclose(ds_conv(xt), ds_elem(xt), atol=5e-2), "ds mismatch"
    assert jnp.allclose(us_conv(xt), us_elem(xt), atol=5e-2), "us mismatch"
    print("elementwise resample parity ok", flush=True)

    def join_concat(h, skip):
        hs = jnp.concatenate([h, skip], axis=-1)
        return conv(hs, w_up1)

    def join_split(h, skip):
        return conv(h, w_up1[:, :c]) + conv(skip, w_up1[:, c:])

    def make_segment(ds, us, join):
        def seg(h):
            h = block(h, w_a, w_b)
            skip = h
            h = ds(h)
            h = block(h, w_a, w_b)       # bottleneck (reuse weights, same shape)
            h = us(h)
            y = nn.gelu(gn(join(h, skip)))
            y = nn.gelu(gn(conv(y, w_b)))
            return skip + y
        return seg

    x = jax.random.normal(key, (bsz, t_len, c), dtype)
    bench("A current (dwconv resample, concat)",
          make_segment(ds_conv, us_conv, join_concat), x)
    bench("B elem resample, concat",
          make_segment(ds_elem, us_elem, join_concat), x)
    bench("C dwconv resample, split join",
          make_segment(ds_conv, us_conv, join_split), x)
    bench("D elem resample, split join",
          make_segment(ds_elem, us_elem, join_split), x)


if __name__ == "__main__":
    main()
