"""Microbench: spatial transformer sub-block costs per UNet level (XLA).

Breaks the 373ms/fwd spatial-transformer cost (BENCH_NOTES r2 ablation)
into self-attn / cross-attn / ff / wrapper(GN+proj_in+proj_out) per level,
to target the round-3 fused kernels. In-program slope methodology
(chain K ops; difference K_LO vs K_HI to cancel the axon call floor).

Usage: PYTHONPATH=/root/repo python dev/bench_spatial.py [level...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.models.attention import BasicTransformerBlock, CrossAttention
from dynamicscaler_tpu.models.layers import FeedForward
from dynamicscaler_tpu.models.unet3d import SpatialTransformer

# microbatch-8 production shape: BF = 8 * 16 frames
BF, L_CTX, CTX_DIM = 128, 93, 1024
LEVELS = {
    "L1": (320, 40 * 64, 5),
    "L2": (640, 20 * 32, 10),
    "L3": (1280, 10 * 16, 20),
    "mid": (1280, 5 * 8, 20),
}
K_LO, K_HI = 1, 3


def slope_ms(fn, params, x, ctx):
    ts = {}
    for K in (K_LO, K_HI):
        def chained(params, x, ctx, K=K):
            out = x
            for _ in range(K):
                out = fn(params, out, ctx)
            return out.astype(jnp.float32).sum()

        jf = jax.jit(chained)
        float(jf(params, x, ctx)); float(jf(params, x, ctx))
        t0 = time.perf_counter()
        for _ in range(3):
            float(jf(params, x, ctx))
        ts[K] = (time.perf_counter() - t0) / 3
    return (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO) * 1e3


def run(name):
    C, N, heads = LEVELS[name]
    side_h = {2560: (40, 64), 640: (20, 32), 160: (10, 16), 40: (5, 8)}[N]
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (BF, N, C), jnp.bfloat16)
    x4 = x3.reshape(BF, *side_h, C)
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (BF, L_CTX, CTX_DIM), jnp.bfloat16)

    def safe(label, fn, params, x, ctx):
        try:
            return slope_ms(fn, params, x, ctx)
        except Exception as e:
            print(f"    [{name}] {label} FAILED: {type(e).__name__} {str(e)[:120]}")
            return float("nan")

    st = SpatialTransformer(C, heads, 64, context_dim=CTX_DIM,
                           img_cross_attention=True, dtype=jnp.bfloat16)
    pst = st.init(key, x4, context=ctx)
    t_full = safe("full", lambda p, x, c: st.apply(p, x, context=c), pst, x4, ctx)

    sa = CrossAttention(heads=heads, dim_head=64, dtype=jnp.bfloat16)
    psa = sa.init(key, x3)
    s = jnp.ones(C); b = jnp.zeros(C)
    t_self = safe(
        "self", lambda p, x, c: sa.apply(p, x, ln=(s, b), add_residual=True), psa, x3, ctx)

    ca = CrossAttention(heads=heads, dim_head=64, context_dim=CTX_DIM,
                        img_cross_attention=True, text_context_len=77,
                        dtype=jnp.bfloat16)
    pca = ca.init(key, x3, context=ctx)
    t_cross = safe(
        "cross", lambda p, x, c: ca.apply(p, x, context=c, ln=(s, b), add_residual=True),
        pca, x3, ctx)

    ff = FeedForward(C, dtype=jnp.bfloat16)
    pff = ff.init(key, x3)
    t_ff = safe(
        "ff", lambda p, x, c: ff.apply(p, x, ln=(s, b), add_residual=True), pff, x3, ctx)

    wrapper = t_full - t_self - t_cross - t_ff
    print(f"[{name}] C={C} N={N}: full={t_full:.2f}ms  self={t_self:.2f}  "
          f"cross={t_cross:.2f}  ff={t_ff:.2f}  wrapper~={wrapper:.2f}")
    # speed-of-light context
    fl_self = 8 * BF * N * C * C + 4 * BF * N * N * C
    fl_cross = 4 * BF * N * C * C + 8 * BF * L_CTX * CTX_DIM * C + 8 * BF * N * L_CTX * C
    fl_ff = 24 * BF * N * C * C
    for nm, fl, t in (("self", fl_self, t_self), ("cross", fl_cross, t_cross),
                      ("ff", fl_ff, t_ff)):
        print(f"    {nm}: {fl/1e9:.0f} GF -> {fl/t/1e9:.0f} GFLOP/s")
    return dict(full=t_full, self_=t_self, cross=t_cross, ff=t_ff)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    names = sys.argv[1:] or list(LEVELS)
    tot = {}
    for nm in names:
        r = run(nm)
        inst = 1 if nm == "mid" else 5
        for k, v in r.items():
            tot[k] = tot.get(k, 0.0) + inst * v
    if len(names) == len(LEVELS):
        print(f"[total/fwd] full={tot['full']:.0f}ms  self={tot['self_']:.0f}  "
              f"cross={tot['cross']:.0f}  ff={tot['ff']:.0f}")
