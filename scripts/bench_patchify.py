"""Micro-benchmark: patchify_video transpose strategies on the real TPU.

The flagship step spends ~4.1 ms in the patchify relayout
(reshape.218 + copy.471 + reshape.219, nn/vit.py:337-339): the
(t, ph, pw, c) interleave defeats XLA's transpose emitter (measured
~25 GB/s). Candidates:

  one    — current single 8-D transpose
  two    — two stages: swap p<->w (48-elem minor units), then hoist
           tubelet past (h, w) (768-elem units); optimization_barrier
           between so XLA cannot re-merge them into the slow single copy
  pad4   — pad C 3->4 first (128-byte pw*C units), transpose, then the
           GEMM uses a row-padded kernel (here: measure relayout only)

Run: python scripts/bench_patchify.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, T, H, W, C = 12, 16, 224, 224, 3
TB, P = 2, 16
t, h, w = T // TB, H // P, W // P


def one(x):
    x = x.reshape(B, t, TB, h, P, w, P, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, t * h * w, TB * P * P * C)


def two(x):
    x = x.reshape(B, t, TB, h, P, w, P * C)
    x = x.transpose(0, 1, 2, 3, 5, 4, 6)  # swap p <-> w
    (x,) = jax.lax.optimization_barrier((x,))
    x = x.transpose(0, 1, 3, 4, 2, 5, 6)  # hoist tubelet past (h, w)
    return x.reshape(B, t * h * w, TB * P * P * C)


def pad4(x):
    xp = jnp.pad(x.reshape(B, T, H, W, C), ((0, 0),) * 4 + ((0, 1),))
    xp = xp.reshape(B, t, TB, h, P, w, P * 4)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6)
    return xp.reshape(B, t * h * w, TB * P * P * 4)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    nbytes = x.size * 2
    for name, fn in [("one", one), ("two", two), ("pad4", pad4)]:
        # consume with a cheap reduce so the relayout isn't DCE'd; sum is
        # layout-agnostic so the transpose dominates
        f = jax.jit(lambda v, fn=fn: fn(v).astype(jnp.float32).sum(axis=(1, 2)))
        jax.device_get(f(x))
        n = 20
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = f(x)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / n
        print(
            f"{name:5s} {dt*1e3:7.3f} ms  "
            f"{2 * nbytes / dt / 1e9:7.1f} GB/s (rd+wr)"
        )

    # parity: two == one
    a = jax.device_get(jax.jit(one)(x)).astype(np.float32)
    b = jax.device_get(jax.jit(two)(x)).astype(np.float32)
    np.testing.assert_array_equal(a, b)
    print("two == one: exact")


if __name__ == "__main__":
    main()
