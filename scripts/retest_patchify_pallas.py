"""Standing retest: Pallas patch-embed reading the f32 video directly,
doing the [TB,h,P,w,P,C] -> [196,1536] relayout IN-KERNEL + a resident
GEMM — the prototype docs/PERF.md's patchify headroom row waits on.

Round 2: Mosaic crashed on the small-minor-dim in-kernel relayout.
Round 5 retest (2026-08-21): STILL CRASHES — remote_compile HTTP 500,
tpu_compile_helper subprocess exit 1 (MosaicError). Re-run this script
after a jaxlib/libtpu upgrade; if it prints COMPILED OK with a time
under ~2.3 ms, wire the kernel into nn/vit.py::PatchEmbed3D behind
patch_embed_mode='pallas' and A/B in-step.

ref being replaced: cuDNN Conv3d patch embed (ref modeling_slot.py:167-176).
"""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

B, T, H, W, C = 12, 16, 224, 224, 3
TB, P, D = 2, 16, 768
t, h, w = T // TB, H // P, W // P  # 8, 14, 14

def kern(x_ref, k_ref, o_ref):
    x = x_ref[0, 0]                      # [TB, H, W, C] f32
    x = x.reshape(TB, h, P, w, P, C)
    x = x.transpose(1, 3, 0, 2, 4, 5)    # [h, w, TB, P, P, C]
    x = x.reshape(h * w, TB * P * P * C) # [196, 1536]
    o_ref[0, 0] = jax.lax.dot(
        x.astype(jnp.bfloat16), k_ref[...],
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)

@jax.jit
def embed(x, kernel):
    return pl.pallas_call(
        kern,
        grid=(B, t),
        in_specs=[
            pl.BlockSpec((1, 1, TB, H, W, C), lambda b, i: (b, i, 0, 0, 0, 0)),
            pl.BlockSpec((TB * P * P * C, D), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h * w, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t, h * w, D), jnp.bfloat16),
    )(x.reshape(B, t, TB, H, W, C), kernel)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
kernel = jnp.asarray((rng.normal(size=(TB*P*P*C, D)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
try:
    out = embed(x, kernel)
    jax.device_get(out[0, 0, 0, :2])
    print("COMPILED OK")
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = embed(x, kernel)
    jax.device_get(out[0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / n
    print(f"pallas in-kernel relayout+GEMM: {dt*1e3:.3f} ms")
    # parity vs XLA
    refp = x.reshape(B, t, TB, h, P, w, P, C).transpose(0,1,3,5,2,4,6,7).reshape(B, t*h*w, TB*P*P*C)
    ref = jnp.einsum("bnk,kd->bnd", refp.astype(jnp.bfloat16), kernel)
    err = float(jnp.abs(ref.reshape(B,t,h*w,D).astype(jnp.float32) - out.astype(jnp.float32)).max())
    print("max err vs XLA:", err)
except Exception as e:
    print("MOSAIC FAILURE:", type(e).__name__)
    print(str(e)[:1500])
