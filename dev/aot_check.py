"""AOT Mosaic-compile check for the fused Pallas kernels — no TPU needed.

libtpu ships the full XLA:TPU + Mosaic compiler; a compile-only PJRT
client obtained via `jax.experimental.topologies` cross-compiles programs
for v5e on the host CPU. This validates that every fusion-ladder kernel
(ops/fused_{temporal,spatial,block,mega,twrap}.py) actually passes the
Mosaic TPU compiler — the one failure mode interpret-mode CPU tests
cannot catch — while the axon tunnel is down.

Usage: PYTHONPATH=/root/repo python -u dev/aot_check.py [unet|blocks|all] [C]
(optional C in {320,640,1280} restricts `blocks` to one level shape —
host cross-compiles take ~1 min each, so split runs to fit timeouts)

Compiles:
  * `blocks`: each Spatial/TemporalTransformer at the three UNet level
    shapes, per fusion-ladder level (xla / subs / wrap+sub / wrap+blk /
    mega) — fast, pinpoints a failing kernel class.
  * `unet`: the full 1.44B UNet forward at the bench shape (B=8) under
    the default ladder — the real integration check, incl. VMEM limits
    seen by Mosaic.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynamicscaler_tpu.ops import fused_temporal

# force the fused path: gating normally checks the *runtime* backend,
# which is CPU here; the lowering target below is the v5e topology
fused_temporal._tpu_available = lambda: True

TOPO = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
MESH = Mesh(np.array(TOPO.devices[:1]).reshape(1), ("d",))
REPL = NamedSharding(MESH, P())

B = 8

# round-2/3a sub-kernels were already Mosaic-validated on the chip; the
# outage-built levels (wrap, block, mega) are what needs checking
LADDER = [
    ("wrap+sub", frozenset(["mega", "block"])),
    ("wrap+blk", frozenset(["mega"])),
    ("mega    ", frozenset()),
]


def _aval(tree):
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=REPL), tree
    )


def compile_fn(fn, *args):
    """Lower against the v5e topology and run the real TPU compile."""
    avals = _aval(jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                               if hasattr(a, "shape") else a, args))
    return jax.jit(fn).lower(*avals).compile()


def check_blocks(only_c=None):
    from dynamicscaler_tpu.models.unet3d import SpatialTransformer, TemporalTransformer

    ok = True
    for C, H, W in [(320, 40, 64), (640, 20, 32), (1280, 10, 16)]:
        if only_c is not None and C != only_c:
            continue
        tt = TemporalTransformer(channels=C, heads=C // 64, dim_head=64,
                                 temporal_length=16, dtype=jnp.bfloat16)
        x = jnp.zeros((B * 16, H, W, C), jnp.bfloat16)
        p = jax.eval_shape(lambda tt=tt, x=x: tt.init(jax.random.PRNGKey(1), x[:16], 16))
        st = SpatialTransformer(channels=C, heads=C // 64, dim_head=64,
                                context_dim=1024, img_cross_attention=True,
                                dtype=jnp.bfloat16)
        ctx = jnp.zeros((B * 16, 93, 1024), jnp.bfloat16)
        ps = jax.eval_shape(lambda st=st, x=x, ctx=ctx: st.init(jax.random.PRNGKey(3), x[:16], ctx[:16]))
        for name, disabled in LADDER:
            fused_temporal._DISABLED = disabled
            for label, fn, args in [
                (f"C={C:4d} {name} temporal",
                 lambda pp, h, tt=tt: tt.apply(pp, h, 16), (p, x)),
                (f"C={C:4d} {name} spatial ",
                 lambda pp, h, c, st=st: st.apply(pp, h, c), (ps, x, ctx)),
            ]:
                try:
                    compile_fn(fn, *args)
                    print(f"{label}: OK")
                except Exception as e:
                    ok = False
                    msg = str(e).replace("\n", " | ")[:400]
                    print(f"{label}: FAIL {type(e).__name__}: {msg}")
    fused_temporal._DISABLED = frozenset()
    return ok


def check_unet(batch=B):
    from dynamicscaler_tpu.config import videocrafter_i2v
    from dynamicscaler_tpu.models.unet3d import UNet3D

    cfg = videocrafter_i2v(dtype="bfloat16")
    unet = UNet3D(cfg.unet, dtype=jnp.bfloat16)
    L = cfg.unet.text_context_len + cfg.resampler.num_queries
    x = jnp.zeros((batch, 16, 40, 64, cfg.unet.in_channels), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, L, cfg.unet.context_dim), jnp.bfloat16)
    p = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), x[:1, :2], t[:1], ctx[:1], 16))
    p = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), p)
    try:
        c = compile_fn(lambda pp, a, b_, cc: unet.apply(pp, a, b_, cc, 16),
                       p, x, t, ctx)
        mem = c.memory_analysis()
        print(f"full UNet fwd B={batch}: OK "
              f"(argmax temp {getattr(mem, 'temp_size_in_bytes', 0)/2**20:.0f} MiB)")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:600]
        print(f"full UNet fwd B={batch}: FAIL {type(e).__name__}: {msg}")
        return False


def check_vae():
    """The VAE's fused GroupNorm(+swish) chains (models/vae.py _gn_silu ->
    ops/fused_twrap.gn_silu) are a Pallas consumer distinct from the UNet:
    eps=1e-6, much larger token counts (decode 320x512 px/frame)."""
    from dynamicscaler_tpu.config import videocrafter_i2v
    from dynamicscaler_tpu.models.vae import AutoencoderKL

    cfg = videocrafter_i2v(dtype="bfloat16")
    vae = AutoencoderKL(cfg.vae, dtype=jnp.bfloat16)
    img = jnp.zeros((2, 320, 512, 3), jnp.bfloat16)
    lat = jnp.zeros((2, 40, 64, cfg.vae.embed_dim), jnp.bfloat16)
    p = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), img[:1, :64, :64]))
    p = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), p)
    ok = True
    for label, fn, args in [
        ("vae encode 320x512", lambda pp, im: vae.apply(pp, im, method=vae.encode), (p, img)),
        ("vae decode 40x64  ", lambda pp, z: vae.apply(pp, z, method=vae.decode), (p, lat)),
    ]:
        try:
            compile_fn(fn, *args)
            print(f"{label}: OK")
        except Exception as e:
            ok = False
            print(f"{label}: FAIL {type(e).__name__}: "
                  f"{str(e).replace(chr(10), ' | ')[:400]}")
    return ok


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    only_c = int(sys.argv[2]) if len(sys.argv) > 2 else None
    ok = True
    if what in ("blocks", "all"):
        ok &= check_blocks(only_c)
    if what in ("vae", "all"):
        ok &= check_vae()
    if what == "unet_b":
        ok &= check_unet(batch=only_c or 16)
    if what in ("unet", "all"):
        ok &= check_unet()
    sys.exit(0 if ok else 1)
