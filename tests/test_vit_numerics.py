"""Numerical parity of the TPU primitives against torch-functional oracles.

These pin the exact reference math (VideoMAE qkv-bias composition, Conv3d
patch embedding, sinusoid table, slot-softmax cross-attention, LayerNorm
eps) without copying reference code: each oracle is an independent
torch/numpy expression of the documented semantics (see file:line refs)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from devias_tpu.nn.vit import Attention, PatchEmbed3D, sinusoid_position_table
from devias_tpu.nn.agg import SlotCrossAttention


def test_sinusoid_table_matches_reference_formula():
    """ref model/modeling_slot.py:181-191."""
    n, d = 12, 8
    table = sinusoid_position_table(n, d)
    for pos in range(n):
        for j in range(d):
            angle = pos / np.power(10000, 2 * (j // 2) / d)
            want = np.sin(angle) if j % 2 == 0 else np.cos(angle)
            np.testing.assert_allclose(table[pos, j], want, rtol=1e-6)


def test_patch_embed_matches_torch_conv3d():
    """Reshape+matmul patch embed == Conv3d(kernel=stride) on NCTHW input
    (ref model/modeling_slot.py:155-177)."""
    rng = np.random.default_rng(0)
    B, T, H, W, C, D, p, tb = 2, 4, 32, 32, 3, 16, 16, 2
    x = rng.normal(size=(B, T, H, W, C)).astype(np.float32)
    pe = PatchEmbed3D(embed_dim=D, patch_size=p, tubelet_size=tb)
    vs = pe.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(pe.apply(vs, jnp.asarray(x)))

    kernel = np.asarray(vs["params"]["kernel"])  # [tb*p*p*C, D]
    bias = np.asarray(vs["params"]["bias"])
    # conv weight layout [D, C, t, h, w] <- kernel reshaped (t, h, w, C, D)
    w = kernel.reshape(tb, p, p, C, D).transpose(4, 3, 0, 1, 2)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCTHW
    ref = TF.conv3d(xt, torch.from_numpy(w), torch.from_numpy(bias), stride=(tb, p, p))
    ref = ref.flatten(2).transpose(1, 2).numpy()  # [B, N, D], (t,h,w) token order
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_self_attention_matches_torch_with_qkv_bias_trick():
    """Fused qkv with q/v biases and zero k bias (ref modeling_slot.py:83-112)."""
    rng = np.random.default_rng(1)
    B, N, C, H = 2, 6, 16, 4
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    attn = Attention(num_heads=H, qkv_bias=True)
    vs = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize biases so the zero-k-bias structure is actually exercised
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), vs["params"]
    )
    out = np.asarray(attn.apply({"params": params}, jnp.asarray(x)))

    qkv_w = np.asarray(params["qkv_kernel"])  # [C, 3C] (flax layout)
    q_b = np.asarray(params["q_bias"])
    v_b = np.asarray(params["v_bias"])
    proj_w = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])

    xt = torch.from_numpy(x)
    bias = torch.from_numpy(np.concatenate([q_b, np.zeros_like(q_b), v_b]))
    qkv = TF.linear(xt, torch.from_numpy(qkv_w.T), bias)
    qkv = qkv.reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = (C // H) ** -0.5
    a = ((q * scale) @ k.transpose(-2, -1)).softmax(dim=-1)
    ref = (a @ v).transpose(1, 2).reshape(B, N, C)
    ref = TF.linear(ref, torch.from_numpy(proj_w.T), torch.from_numpy(proj_b)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_slot_cross_attention_matches_torch_oracle():
    """Inverted softmax over the slot axis + key renorm + sim_distill output
    (ref agg_block/attention.py:120-141)."""
    rng = np.random.default_rng(2)
    B, S, N, D, heads, dh = 2, 3, 10, 16, 4, 8
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    ctx = rng.normal(size=(B, N, D)).astype(np.float32)
    mod = SlotCrossAttention(query_dim=D, context_dim=D, heads=heads, dim_head=dh)

    def full(m, x_, ctx_):
        k, v = m.project_kv(ctx_)
        return m(x_, k, v)

    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx), method=full)
    out, sim = mod.apply(vs, jnp.asarray(x), jnp.asarray(ctx), method=full)
    out, sim = np.asarray(out), np.asarray(sim)

    p = vs["params"]
    wq = np.asarray(p["to_q"]["kernel"])  # [D, heads*dh]
    wk = np.asarray(p["to_k"]["kernel"])
    wv = np.asarray(p["to_v"]["kernel"])
    wo = np.asarray(p["to_out"]["kernel"])
    bo = np.asarray(p["to_out"]["bias"])

    xt, ct = torch.from_numpy(x), torch.from_numpy(ctx)
    q = (xt @ torch.from_numpy(wq)).reshape(B, S, heads, dh).permute(0, 2, 1, 3)
    k = (ct @ torch.from_numpy(wk)).reshape(B, N, heads, dh).permute(0, 2, 1, 3)
    v = (ct @ torch.from_numpy(wv)).reshape(B, N, heads, dh).permute(0, 2, 1, 3)
    simr = (q @ k.transpose(-2, -1)) * dh**-0.5  # [B, h, S, N]
    attn = simr.softmax(dim=2)  # over slots
    sim_distill = attn.clone()
    attn = attn / (attn.sum(dim=-1, keepdim=True) + 1e-7)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(B, S, heads * dh)
    o = (o @ torch.from_numpy(wo) + torch.from_numpy(bo)).numpy()

    np.testing.assert_allclose(sim, sim_distill.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out, o, rtol=1e-4, atol=1e-5)


def test_layernorm_eps_matches_torch():
    """Backbone LNs use eps=1e-6 (ref modeling_slot.py:420); torch default
    LNs elsewhere use 1e-5."""
    import flax.linen as nn

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 16)).astype(np.float32) * 10
    for eps in (1e-6, 1e-5):
        ln = nn.LayerNorm(epsilon=eps)
        vs = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(ln.apply(vs, jnp.asarray(x)))
        ref = TF.layer_norm(torch.from_numpy(x), (16,), eps=eps).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    ref = TF.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_patch_embed_lowerings_agree():
    """conv, patchify+matmul, and multi-contraction dot_general are the same
    linear map (PatchEmbed3D docstring; the 'dot' form exists so XLA can
    plan a single operand relayout instead of the copy+reshape pair,
    docs/PERF.md round-3)."""
    import numpy as np
    from devias_tpu.nn.vit import PatchEmbed3D

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    mods = {m: PatchEmbed3D(embed_dim=96, mode=m) for m in ("conv", "patchify", "dot")}
    params = mods["conv"].init({"params": jax.random.PRNGKey(0)}, x)
    outs = {m: mod.apply(params, x) for m, mod in mods.items()}
    assert outs["conv"].shape == (2, 2 * 2 * 2, 96)
    np.testing.assert_allclose(outs["conv"], outs["patchify"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs["patchify"], outs["dot"], rtol=1e-6, atol=1e-6)

    # gradient wrt the kernel agrees too (the step differentiates through it)
    def loss(m, p):
        return (mods[m].apply(p, x) ** 2).sum()

    g1 = jax.grad(lambda p: loss("patchify", p))(params)
    g2 = jax.grad(lambda p: loss("dot", p))(params)
    np.testing.assert_allclose(
        g1["params"]["kernel"], g2["params"]["kernel"], rtol=1e-5, atol=1e-4
    )
