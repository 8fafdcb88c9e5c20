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


def embed_base(x, kernel):
    """Current production lowering: full patchify transpose + one K=1536 GEMM."""
    p = one(x)
    return jnp.dot(p, kernel.reshape(TB * P * P * C, -1),
                   preferred_element_type=jnp.float32)


def embed_slices(x, kernel):
    """Relayout-free: the (dt, ph) interleave never materializes. For each of
    the 32 (tubelet-frame, patch-row) offsets, the needed rows are a strided
    slice whose minor unit is a full contiguous W*C run (224*3 elems =
    1344 B), reshaped [B, t, h, w, P*C] for free — then a K=48 GEMM against
    the matching kernel rows, accumulated. Trades ~0.4 ms of extra MXU
    passes (K=48 fills 48/128 of the array) for the whole transpose."""
    ker = kernel.reshape(TB, P, P * C, -1)
    xr = x.reshape(B, t, TB, h, P, W * C)
    acc = None
    for dt in range(TB):
        for ph in range(P):
            s = xr[:, :, dt, :, ph, :].reshape(B, t * h * w, P * C)
            part = jnp.dot(s, ker[dt, ph], preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc


def embed_friendly(x, kernel):
    """Hoist (dt, ph) outward with ONE big-minor-unit transpose (1344 B
    contiguous runs), then 32 contiguous-slice K=48 GEMMs."""
    ker = kernel.reshape(TB, P, P * C, -1)
    y = x.reshape(B, t, TB, h, P, W * C).transpose(2, 4, 0, 1, 3, 5)
    (y,) = jax.lax.optimization_barrier((y,))
    acc = None
    for dt in range(TB):
        for ph in range(P):
            s = y[dt, ph].reshape(B, t * h * w, P * C)
            part = jnp.dot(s, ker[dt, ph], preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc


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

    # full patch-embed (patchify + GEMM) strategies
    kernel = jnp.asarray(
        rng.normal(size=(TB * P * P * C, 768)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    ref = None
    for name, fn in [
        ("embed_base", embed_base),
        ("embed_slices", embed_slices),
        ("embed_friendly", embed_friendly),
    ]:
        f = jax.jit(lambda v, k, fn=fn: fn(v, k).sum(axis=(1, 2)))
        jax.device_get(f(x, kernel))
        n = 20
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = f(x, kernel)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:15s} {dt*1e3:7.3f} ms")
        full = jax.device_get(jax.jit(fn)(x, kernel))
        if ref is None:
            ref = full
        else:
            d = np.abs(full - ref)
            print(f"  max|d| vs base: {d.max():.4f} (scale {np.abs(ref).max():.2f})")


if __name__ == "__main__":
    main()
