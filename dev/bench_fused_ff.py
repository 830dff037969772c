"""Microbench: fused LN+GEGLU kernel vs XLA path (in-program slope)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from dynamicscaler_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from dynamicscaler_tpu.models.layers import FeedForward
from dynamicscaler_tpu.ops import fused_temporal

SHAPES = [("L1", 16 * 2560, 320), ("L2", 16 * 640, 640), ("L3", 16 * 160, 1280)]  # tokens per frame-batch x F=16

for name, T_, C in SHAPES:
    T = T_ * 16 // 16  # tokens: rows*F for temporal == BF*N for spatial
    Tt = {320: 16 * 40 * 64 * 16, 640: 16 * 20 * 32 * 16, 1280: 16 * 10 * 16 * 16}[C]
    mod = FeedForward(dim=C, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (Tt, C), jnp.bfloat16)
    s = jnp.ones(C); b = jnp.zeros(C)
    inner = 4 * C
    params = {"params": {
        "geglu": {"proj": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (C, inner * 2), jnp.float32) / np.sqrt(C),
                           "bias": jnp.zeros(inner * 2)}},
        "out": {"kernel": jax.random.normal(jax.random.PRNGKey(2), (inner, C), jnp.float32) / np.sqrt(inner),
                "bias": jnp.zeros(C)}}}

    def sub(x):
        return mod.apply(params, x, ln=(s, b), add_residual=True)

    fused_temporal.set_mode("off"); ref = jax.jit(sub)(x)
    fused_temporal.set_mode("auto"); got = jax.jit(sub)(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"[{name}] tokens={Tt} err={err:.4g} (ref max {float(jnp.max(jnp.abs(ref.astype(jnp.float32)))):.3g})")

    for mode in ("off", "auto"):
        ts = {}
        for K in (2, 10):
            def f(x, K=K, mode=mode):
                fused_temporal.set_mode(mode)
                o = x
                for _ in range(K):
                    o = sub(o)
                return o.astype(jnp.float32).sum()
            fn = jax.jit(f)
            float(fn(x)); float(fn(x))
            t0 = time.perf_counter()
            for _ in range(3): float(fn(x))
            ts[K] = (time.perf_counter() - t0) / 3
        per_op = (ts[10] - ts[2]) / 8 * 1e3
        print(f"[{name}] {mode:4s}: {per_op:.3f} ms/op")
