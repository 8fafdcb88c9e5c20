"""Time the fused attention entries on the real chip (fwd and fwd+bwd).

A/B harness for kernel-body experiments (e.g. exp vs exp2 softmax
lowering). Chains 12 data-dependent layers inside ONE jit so relay
dispatch overhead (~14 ms/call) is amortized; prints ms/layer at the
flagship geometry, batch 12.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
import jax.numpy as jnp
import numpy as np
from devias_tpu.kernels.attention import fused_attention_qkv

B, H, N, D, L = 12, 12, 1568, 64, 12
scale = D ** -0.5
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B, N, 3 * H * D)) * 0.5, jnp.bfloat16)
cot = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.bfloat16)


def chain(x):
    # data-dependent chain: each layer's output perturbs the next qkv
    for _ in range(L):
        o = fused_attention_qkv(x, H, scale)
        x = x + 0.01 * jnp.concatenate([o, o, o], axis=-1)
    return x


fwd = chain
vjp = jax.grad(lambda x: (chain(x).astype(jnp.float32)[..., : H * D]
                          * cot.astype(jnp.float32)).sum())


def timeit(f, x, iters=8):
    # iterations must form a DEPENDENT chain: over the axon relay an
    # independent loop is dominated by the per-call dispatch RPC (~14-56 ms
    # depending on graph size) and times the relay, not the device; chained
    # iterations overlap dispatch with compute and recover device time.
    step = jax.jit(lambda x: 0.999 * f(x))
    np.asarray(jax.device_get(step(x).reshape(-1)[0]))
    t0 = time.perf_counter()
    r = x
    for _ in range(iters):
        r = step(r)
    np.asarray(jax.device_get(r.reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def retry(f, *a, tries=4):
    for i in range(tries):
        try:
            return timeit(f, *a)
        except Exception as exc:  # relay flakes: back off and retry
            print(f"  retry {i}: {type(exc).__name__}", flush=True)
            time.sleep(20)
    raise SystemExit("relay unavailable")


ms_f = retry(fwd, qkv)
print(f"fwd   {ms_f / L:7.3f} ms/layer   ({ms_f:.1f} ms / {L} layers, incl. resid adds)", flush=True)
ms_b = retry(vjp, qkv)
print(f"f+bwd {ms_b / L:7.3f} ms/layer   ({ms_b:.1f} ms / {L} layers)", flush=True)
