"""Smoke: fused cross-attention kernel compiles + matches XLA on real TPU
at the real-model shapes (77 text + 16 image tokens, Dc=1024).

Usage: PYTHONPATH=/root/repo python dev/smoke_cross_tpu.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.ops import fused_spatial, fused_temporal

print("platform:", jax.devices()[0].platform)

SHAPES = [  # (B, N, C, heads) — L1/L2/L3 spatial cross-attention
    (8 * 16, 2560, 320, 5),
    (8 * 16, 640, 640, 10),
    (8 * 16, 160, 1280, 20),
]
TEXT, IMG, DC = 77, 16, 1024

for B, N, C, heads in SHAPES:
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    x = mk(B, N, C).astype(jnp.bfloat16)
    ctx = mk(B, TEXT + IMG, DC).astype(jnp.bfloat16)
    s, b = mk(C) + 1.0, mk(C)
    wq, wk, wv, wo = mk(C, C), mk(DC, C), mk(DC, C), mk(C, C)
    wki, wvi, bo = mk(DC, C), mk(DC, C), mk(C)
    scale = (C // heads) ** -0.5

    assert fused_spatial.cross_fusable(N, C, C, heads, DC)
    fused_temporal.set_mode("auto")
    out = fused_spatial.fused_ln_cross_attention(
        x, ctx, s, b, wq, wk, wv, wo, bo, wki, wvi,
        heads=heads, scale=scale, text_len=TEXT)
    out = np.asarray(out)

    # XLA oracle (same math, unfused)
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    h = ((xf - mu) / np.sqrt(var + 1e-5) * np.asarray(s) + np.asarray(b))
    h = jnp.asarray(h, jnp.bfloat16)
    q = (h @ wq.astype(jnp.bfloat16)).reshape(B, N, heads, C // heads)

    def attend(ctx_seg, wk_, wv_):
        k = (ctx_seg @ wk_.astype(jnp.bfloat16)).reshape(B, -1, heads, C // heads)
        v = (ctx_seg @ wv_.astype(jnp.bfloat16)).reshape(B, -1, heads, C // heads)
        lg = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(lg, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v)

    o = attend(ctx[:, :TEXT], wk, wv) + attend(ctx[:, TEXT:], wki, wvi)
    ref = o.reshape(B, N, C) @ wo.astype(jnp.bfloat16) + bo.astype(jnp.bfloat16)
    ref = np.asarray(ref + x, np.float32)

    err = np.abs(out.astype(np.float32) - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f"N={N} C={C}: max abs err {err:.4f} (rel {rel:.4f}) "
          f"out std {out.astype(np.float32).std():.3f}")
    assert rel < 0.05, "kernel vs XLA oracle mismatch"

# text-only variant (t2v model): no image context / image-KV operands
B, N, C, heads = 64, 640, 640, 10
rng = np.random.RandomState(1)
mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
x = mk(B, N, C).astype(jnp.bfloat16)
ctx = mk(B, TEXT, DC).astype(jnp.bfloat16)
s, b = mk(C) + 1.0, mk(C)
wq, wk, wv, wo, bo = mk(C, C), mk(DC, C), mk(DC, C), mk(C, C), mk(C)
scale = (C // heads) ** -0.5
out = np.asarray(fused_spatial.fused_ln_cross_attention(
    x, ctx, s, b, wq, wk, wv, wo, bo, heads=heads, scale=scale))
xf = np.asarray(x, np.float32)
h = ((xf - xf.mean(-1, keepdims=True)) / np.sqrt(xf.var(-1, keepdims=True) + 1e-5)
     * np.asarray(s) + np.asarray(b))
h = jnp.asarray(h, jnp.bfloat16)
q = (h @ wq.astype(jnp.bfloat16)).reshape(B, N, heads, C // heads)
k = (ctx @ wk.astype(jnp.bfloat16)).reshape(B, TEXT, heads, C // heads)
v = (ctx @ wv.astype(jnp.bfloat16)).reshape(B, TEXT, heads, C // heads)
lg = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
p = jax.nn.softmax(lg, -1).astype(jnp.bfloat16)
o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, C)
ref = np.asarray(o @ wo.astype(jnp.bfloat16) + bo.astype(jnp.bfloat16) + x, np.float32)
rel = np.abs(out.astype(np.float32) - ref).max() / np.abs(ref).max()
print(f"text-only N={N} C={C}: rel err {rel:.4f}")
assert rel < 0.05

print("SMOKE OK: cross kernel compiles and matches on TPU at all levels")
