"""On-device numeric parity of the Pallas attention entries vs pure XLA.

The CPU test suite exercises the kernels through the Pallas interpreter;
this script validates the MOSAIC-compiled kernels on real TPU hardware
(catching miscompiles the interpreter cannot). Run: make check-tpu.
Expected: max deviations ~1 bf16 ulp (2.4e-4 fwd / 4.9e-4 bwd measured
on v5e)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
import jax.numpy as jnp
import numpy as np
from devias_tpu.kernels.attention import fused_attention_qkv, fused_attention_q_kv

B, H, N, D = 2, 12, 1568, 64
scale = D ** -0.5
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B,N,3*H*D)) * 0.5, jnp.bfloat16)
cot = jnp.asarray(rng.normal(size=(B,N,H*D)), jnp.bfloat16)

def ref(qkv):
    C = H*D
    q, k, v = (qkv[..., i*C:(i+1)*C].reshape(B,N,H,D) for i in range(3))
    s = jnp.einsum("bnhd,bmhd->bhnm", (q*scale).astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32)).reshape(B,N,C).astype(jnp.bfloat16)

out_k = jax.jit(lambda x: fused_attention_qkv(x, H, scale))(qkv)
out_r = jax.jit(ref)(qkv)
d = np.abs(np.asarray(out_k, np.float32) - np.asarray(out_r, np.float32))
print("fwd max|d|:", d.max(), "mean:", d.mean())
assert d.max() < 0.03, d.max()

g_k = jax.jit(jax.grad(lambda x: (fused_attention_qkv(x, H, scale).astype(jnp.float32)*cot.astype(jnp.float32)).sum()))(qkv)
g_r = jax.jit(jax.grad(lambda x: (ref(x).astype(jnp.float32)*cot.astype(jnp.float32)).sum()))(qkv)
gd = np.abs(np.asarray(g_k, np.float32) - np.asarray(g_r, np.float32))
gs = np.abs(np.asarray(g_r, np.float32)).max()
print("bwd max|d|:", gd.max(), "ref scale:", gs)
assert gd.max() < 0.05 * max(gs, 1.0), (gd.max(), gs)

# q/kv split entry (SP building block) on-device
q = qkv[..., :H*D]; kv = qkv[..., H*D:]
out_s = jax.jit(lambda q, kv: fused_attention_q_kv(q, kv, H, scale))(q, kv)
ds = np.abs(np.asarray(out_s, np.float32) - np.asarray(out_r, np.float32))
print("q_kv fwd max|d|:", ds.max())
assert ds.max() < 0.03
g_s = jax.jit(jax.grad(lambda q, kv: (fused_attention_q_kv(q, kv, H, scale).astype(jnp.float32)*cot.astype(jnp.float32)).sum(), argnums=(0,1)))(q, kv)
g_cat = np.concatenate([np.asarray(g_s[0], np.float32), np.asarray(g_s[1], np.float32)], axis=-1)
gd2 = np.abs(g_cat - np.asarray(g_r, np.float32))
print("q_kv bwd max|d|:", gd2.max())
assert gd2.max() < 0.05 * max(gs, 1.0)
# head_dim-16 geometry (hpb = 8 heads per 128-lane block): exercises the
# stats-width-follows-hpb path that a hardcoded 8-lane buffer broke
H2, D2, N2 = 8, 16, 1024
scale2 = D2 ** -0.5
qkv2 = jnp.asarray(rng.normal(size=(2, N2, 3*H2*D2)) * 0.5, jnp.bfloat16)
cot2 = jnp.asarray(rng.normal(size=(2, N2, H2*D2)), jnp.bfloat16)
def ref2(x):
    C2 = H2*D2
    q2, k2, v2 = (x[..., i*C2:(i+1)*C2].reshape(2, N2, H2, D2) for i in range(3))
    s2 = jnp.einsum("bnhd,bmhd->bhnm", (q2*scale2).astype(jnp.float32), k2.astype(jnp.float32))
    p2 = jax.nn.softmax(s2, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p2, v2.astype(jnp.float32)).reshape(2, N2, C2).astype(jnp.bfloat16)
o2 = jax.jit(lambda x: fused_attention_qkv(x, H2, scale2))(qkv2)
d2 = np.abs(np.asarray(o2, np.float32) - np.asarray(jax.jit(ref2)(qkv2), np.float32)).max()
print("hpb=8 fwd max|d|:", d2)
assert d2 < 0.03
g2 = jax.jit(jax.grad(lambda x: (fused_attention_qkv(x, H2, scale2).astype(jnp.float32)*cot2.astype(jnp.float32)).sum()))(qkv2)
g2r = jax.jit(jax.grad(lambda x: (ref2(x).astype(jnp.float32)*cot2.astype(jnp.float32)).sum()))(qkv2)
d2g = np.abs(np.asarray(g2, np.float32) - np.asarray(g2r, np.float32)).max()
print("hpb=8 bwd max|d|:", d2g)
assert d2g < 0.05
print("TPU kernel parity OK")
