"""Probe: fused temporal-attention kernel at C=1280 (L3/mid shapes)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from dynamicscaler_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from dynamicscaler_tpu.models.attention import CrossAttention
from dynamicscaler_tpu.ops import fused_temporal

# temporarily widen the gate for the probe
import dynamicscaler_tpu.ops.fused_temporal as ft
_orig = ft.fusable
ft.fusable = lambda n, inner, qd, h: (
    inner <= 1280 and n >= 2 and 128 % n == 0 and inner == qd
    and inner % h == 0 and (inner // h) % 8 == 0
    and (ft._MODE != "off") and (ft._MODE == "interpret" or ft._tpu_available())
)

R, F, C, heads = 16 * 10 * 16, 16, 1280, 20
mod = CrossAttention(heads=heads, dim_head=C // heads, dtype=jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(0), (R, F, C), jnp.bfloat16)
s = jnp.ones(C); b = jnp.zeros(C)
mats = [jax.random.normal(jax.random.PRNGKey(i), (C, C), jnp.float32) / np.sqrt(C) for i in range(4)]
params = {"params": {"to_q": {"kernel": mats[0]}, "to_k": {"kernel": mats[1]},
                     "to_v": {"kernel": mats[2]},
                     "to_out": {"kernel": mats[3], "bias": jnp.zeros(C)}}}

def sub(x):
    return mod.apply(params, x, ln=(s, b), add_residual=True)

ft.set_mode("off"); ref = jax.jit(sub)(x)
ft.set_mode("auto"); got = jax.jit(sub)(x)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"err={err:.4g}")
for mode in ("off", "auto"):
    ts = {}
    for K in (2, 10):
        def f(x, K=K, mode=mode):
            ft.set_mode(mode)
            o = x
            for _ in range(K):
                o = sub(o)
            return o.astype(jnp.float32).sum()
        fn = jax.jit(f)
        float(fn(x)); float(fn(x))
        t0 = time.perf_counter()
        for _ in range(3): float(fn(x))
        ts[K] = (time.perf_counter() - t0) / 3
    print(f"{mode:4s}: {(ts[10]-ts[2])/8*1e3:.3f} ms/op")
