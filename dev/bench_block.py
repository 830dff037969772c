"""TPU smoke + in-program slope bench for the round-3 whole-block and
wrapper fused kernels (ops/fused_block.py, ops/fused_twrap.py).

Compares, per real UNet shape, the fused path against the same module
with that kernel class disabled (DSCALER_FUSE_DISABLE), using K=2 vs K=12
chained calls inside one program to cancel the axon per-call floor.

Usage: PYTHONPATH=/root/repo python dev/bench_block.py [temporal|spatial|xfmr|all]
"""

import sys
import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.models.attention import BasicTransformerBlock
from dynamicscaler_tpu.models.unet3d import SpatialTransformer, TemporalTransformer
from dynamicscaler_tpu.ops import fused_temporal

B = 8  # CFG-packed window batch, matching bench.py


def slope(fn, *args, k_lo=2, k_hi=12):
    def chained(K):
        def f(*a):
            out = a[0]
            for _ in range(K):
                out = fn(out, *a[1:])
            return out.astype(jnp.float32).sum()
        return jax.jit(f)

    ts = {}
    for K in (k_lo, k_hi):
        g = chained(K)
        float(g(*args)); float(g(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            float(g(*args))
        ts[K] = (time.perf_counter() - t0) / 3
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def bench_temporal():
    # level shapes: (C, H, W); rows = B*H*W, tokens = 16 frames
    for C, H, W in [(320, 40, 64), (640, 20, 32), (1280, 10, 16)]:
        blk = BasicTransformerBlock(dim=C, heads=C // 64, dim_head=64,
                                    dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (B * H * W, 16, C),
                              jnp.bfloat16)
        p = blk.init(jax.random.PRNGKey(1), x[:128])

        fused_temporal._DISABLED = frozenset(["block"])
        t_sub = slope(lambda h, pp: blk.apply(pp, h), x, p)
        fused_temporal._DISABLED = frozenset()
        t_blk = slope(lambda h, pp: blk.apply(pp, h), x, p)
        print(f"temporal block C={C:4d} rows={B*H*W:6d}: "
              f"sub-kernels {t_sub:6.2f} ms  whole-block {t_blk:6.2f} ms "
              f"(x{t_sub / t_blk:.2f})")


def bench_spatial():
    for C, H, W in [(320, 40, 64), (640, 20, 32)]:
        blk = BasicTransformerBlock(dim=C, heads=C // 64, dim_head=64,
                                    context_dim=1024, img_cross_attention=True,
                                    dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (B * 16, H * W, C),
                              jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (B * 16, 93, 1024),
                                jnp.bfloat16)
        p = blk.init(jax.random.PRNGKey(2), x[:2], ctx[:2])

        fused_temporal._DISABLED = frozenset(["block"])
        t_sub = slope(lambda h, c, pp: blk.apply(pp, h, c), x, ctx, p)
        fused_temporal._DISABLED = frozenset()
        t_blk = slope(lambda h, c, pp: blk.apply(pp, h, c), x, ctx, p)
        print(f"spatial block C={C:4d} N={H*W:5d}: "
              f"sub-kernels {t_sub:6.2f} ms  whole-block {t_blk:6.2f} ms "
              f"(x{t_sub / t_blk:.2f})")


LADDER = [
    ("xla     ", frozenset(["mega", "block", "wrap", "temporal", "spatial",
                            "cross", "ff"])),
    ("subs    ", frozenset(["mega", "block", "wrap"])),  # r2 sub-kernels
    ("wrap+sub", frozenset(["mega", "block"])),
    ("wrap+blk", frozenset(["mega"])),
    ("mega    ", frozenset()),
]


def bench_xfmr():
    # whole transformer (GN + proj wrapper + block) across the fusion ladder.
    # DSCALER_BENCH_C="1280" (comma list) restricts the level sweep so a
    # resumed run doesn't redo rows an earlier (timed-out) run already logged.
    import os
    want = os.environ.get("DSCALER_BENCH_C")
    want = {int(c) for c in want.split(",")} if want else None
    for C, H, W in [(320, 40, 64), (640, 20, 32), (1280, 10, 16)]:
        if want is not None and C not in want:
            continue
        tt = TemporalTransformer(channels=C, heads=C // 64, dim_head=64,
                                 temporal_length=16, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (B * 16, H, W, C),
                              jnp.bfloat16)
        p = tt.init(jax.random.PRNGKey(1), x[:16], 16)
        st = SpatialTransformer(channels=C, heads=C // 64, dim_head=64,
                                context_dim=1024, img_cross_attention=True,
                                dtype=jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B * 16, 93, 1024),
                                jnp.bfloat16)
        ps = st.init(jax.random.PRNGKey(3), x[:16], ctx[:16])
        for name, disabled in LADDER:
            fused_temporal._DISABLED = disabled
            t = slope(lambda h, pp: tt.apply(pp, h, 16), x, p)
            s = slope(lambda h, c, pp: st.apply(pp, h, c), x, ctx, ps)
            print(f"C={C:4d} {name}: temporal {t:7.2f} ms  spatial {s:7.2f} ms")
        fused_temporal._DISABLED = frozenset()


if __name__ == "__main__":
    # ladder sweeps select levels via _DISABLED alone — the measured
    # per-shape plan (fused_temporal._PLAN) must not pre-veto levels here
    fused_temporal.set_plan("off")
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("temporal", "all"):
        bench_temporal()
    if what in ("spatial", "all"):
        bench_spatial()
    if what in ("xfmr", "all"):
        bench_xfmr()
