"""Fused Pallas TPU kernels for the transformer *wrapper* layers.

Every Spatial/TemporalTransformer in the UNet brackets its token blocks
with the same bandwidth-bound chain (lvdm/modules/attention.py:223-278,
281-373):

    GroupNorm(32, fp32) -> [transpose to token layout] -> proj_in Dense
    ... token blocks ...
    proj_out Dense -> [transpose back] -> + residual

On XLA each arrow is one or two full HBM round-trips over the level's
activation tensor (210 MB at L1, B=8) — none of it is MXU work worth
that traffic. These kernels collapse the bracket to one read+write each:

* ``gn_proj_in``: normalize with *precomputed* GroupNorm statistics
  (folded to per-(sample, channel) scale/offset vectors — the reduction
  itself is one cheap XLA pass), permute the frame axis into tokens when
  requested, and run the proj_in matmul on VMEM-resident data.
* ``proj_out_residual``: proj_out matmul, permute back, add the residual
  read directly in the *native* layout.

The frame-axis permute is VMEM-internal: the lane (channel) dimension is
untouched, so Mosaic implements it as vreg re-indexing instead of an HBM
relayout pass.

Numerics match the unfused path (fp32 GroupNorm statistics, bf16 matmul
inputs) to bf16 rounding; parity is tested in interpret mode on CPU
(tests/test_fused_twrap.py). Mode/kill switches are shared with the other
fused kernels (ops/fused_temporal.py: DSCALER_FUSED_TEMPORAL,
DSCALER_FUSE_DISABLE=wrap).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamicscaler_tpu.ops import fused_temporal


def _mode() -> str:
    return fused_temporal.mode()


def _enabled(side: str, C: int) -> bool:
    if _mode() == "off" or fused_temporal.kernel_disabled("wrap"):
        return False
    if not fused_temporal.plan_allows("wrap", side, C):
        return False
    return _mode() == "interpret" or fused_temporal._tpu_available()


def group_norm_fold(x5, scale, bias, num_groups: int = 32, eps: float = 1e-6):
    """Per-(sample, channel) GroupNorm normalization vectors.

    x5: [B, *spatial, C] — statistics reduce over everything but B (torch
    GroupNorm semantics; for the temporal transformer B is the clip batch,
    for the spatial transformer it is batch*frames). Returns fp32
    (mul, add) of shape [B, C] such that ``normalized = x * mul + add``.
    One cheap XLA reduction pass; the elementwise apply happens inside the
    fused kernels.
    """
    B = x5.shape[0]
    C = x5.shape[-1]
    G = num_groups
    xf = x5.astype(jnp.float32).reshape(B, -1, G, C // G)
    mu = jnp.mean(xf, axis=(1, 3))  # [B, G]
    mu2 = jnp.mean(xf * xf, axis=(1, 3))
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)  # [B, G]
    rstd_c = jnp.repeat(rstd, C // G, axis=1)  # [B, C]
    mu_c = jnp.repeat(mu, C // G, axis=1)
    mul = rstd_c * scale.astype(jnp.float32)[None]
    add = bias.astype(jnp.float32)[None] - mu_c * mul
    return mul, add


def _head_kernel(x_ref, mul_ref, add_ref, w_ref, b_ref, o_ref, *, permute: bool):
    # x block: [F, TH, W, C] (temporal, permute=True; one b per grid row)
    #       or [TB, N, C]    (spatial,  permute=False)
    # mul/add blocks are [1, 1, C] / [TB, 1, C]: per-sample GN vectors ride
    # a unit sublane axis (Mosaic requires block sublane dims %8 or == array)
    if permute:
        F, TH, W, C = x_ref.shape
        x = x_ref[:].reshape(F, TH * W, C)
        xn = x.astype(jnp.float32) * mul_ref[:] + add_ref[:]
        h = jnp.transpose(xn.astype(o_ref.dtype), (1, 0, 2))  # [THW, F, C]
        R, T = TH * W, F
    else:
        TB, N, C = x_ref.shape
        x = x_ref[:]
        xn = x.astype(jnp.float32) * mul_ref[:] + add_ref[:]
        h = xn.astype(o_ref.dtype)
        R, T = TB, N
    Ci = w_ref.shape[1]
    out = jnp.dot(
        h.reshape(R * T, C), w_ref[:], preferred_element_type=jnp.float32
    )
    out = (out + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[:] = out.reshape(R, T, Ci)


def _tail_kernel(y_ref, x_ref, w_ref, b_ref, o_ref, *, permute: bool):
    # y block: [THW, F, Ci] / [TB, N, Ci]; x (residual, native layout):
    # [F, TH, W, C] / [TB, N, C]; out matches x.
    R, T, Ci = y_ref.shape
    C = w_ref.shape[1]
    o = jnp.dot(
        y_ref[:].reshape(R * T, Ci), w_ref[:], preferred_element_type=jnp.float32
    )
    o = (o + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    if permute:
        F, TH, W, _ = x_ref.shape
        o = jnp.transpose(o.reshape(R, T, C), (1, 0, 2))  # [F, THW, C]
        o_ref[:] = (o.reshape(F, TH, W, C) + x_ref[:]).astype(o_ref.dtype)
    else:
        o_ref[:] = (o.reshape(R, T, C) + x_ref[:]).astype(o_ref.dtype)


def _h_tile(F: int, H: int, W: int, C: int, Ci: int, itemsize: int) -> int:
    """Rows of H per temporal grid block: bound the [F, TH*W, C] fp32
    normalize transient + bf16 in/out tiles to ~24MB."""
    budget = 24 * 1024 * 1024
    per_h = F * W * max(C, Ci) * (4 + 3 * itemsize)
    th = max(1, budget // per_h)
    while H % th:
        th -= 1
    return th


def _tb_tile(N: int, C: int, Ci: int, itemsize: int) -> int:
    budget = 24 * 1024 * 1024
    per_row = N * max(C, Ci) * (4 + 3 * itemsize)
    return min(16, max(1, budget // per_row))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _head_temporal(x5, mul, add, w, b, *, interpret):
    B, F, H, W, C = x5.shape
    Ci = w.shape[1]
    TH = _h_tile(F, H, W, C, Ci, x5.dtype.itemsize)
    grid = (B, H // TH)
    x4 = x5.reshape(B * F, H, W, C)  # 4-D blocks: (F, TH, W, C) per (b, i)
    mul, add = mul[:, None, :], add[:, None, :]
    out = pl.pallas_call(
        functools.partial(_head_kernel, permute=True),
        out_shape=jax.ShapeDtypeStruct((B * H * W, F, Ci), x5.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, TH, W, C), lambda bq, i: (bq, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bq, i: (bq, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bq, i: (bq, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TH * W, F, Ci),
            lambda bq, i: (bq * (H // TH) + i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * F * H * W * C * Ci,
            bytes_accessed=B * F * H * W * (C + Ci) * x5.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x4, mul, add, w, b)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_temporal(y, x5, w, b, *, interpret):
    B, F, H, W, C = x5.shape
    Ci = y.shape[-1]
    TH = _h_tile(F, H, W, C, Ci, x5.dtype.itemsize)
    grid = (B, H // TH)
    x4 = x5.reshape(B * F, H, W, C)
    x_spec = pl.BlockSpec(
        (F, TH, W, C), lambda bq, i: (bq, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_tail_kernel, permute=True),
        out_shape=jax.ShapeDtypeStruct((B * F, H, W, C), x5.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TH * W, F, Ci),
                lambda bq, i: (bq * (H // TH) + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            x_spec,
            pl.BlockSpec((Ci, C), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * F * H * W * C * Ci,
            bytes_accessed=B * F * H * W * (3 * C + Ci) * x5.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y, x4, w, b)
    return out.reshape(B, F, H, W, C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _head_spatial(x3, mul, add, w, b, *, interpret):
    B, N, C = x3.shape
    Ci = w.shape[1]
    TB = _tb_tile(N, C, Ci, x3.dtype.itemsize)
    pad = (-B) % TB
    if pad:
        x3 = jnp.pad(x3, ((0, pad), (0, 0), (0, 0)))
        mul = jnp.pad(mul, ((0, pad), (0, 0)))
        add = jnp.pad(add, ((0, pad), (0, 0)))
    Bp = B + pad
    mul, add = mul[:, None, :], add[:, None, :]
    out = pl.pallas_call(
        functools.partial(_head_kernel, permute=False),
        out_shape=jax.ShapeDtypeStruct((Bp, N, Ci), x3.dtype),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, N, Ci), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * C * Ci,
            bytes_accessed=Bp * N * (C + Ci) * x3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, mul, add, w, b)
    return out[:B] if pad else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_spatial(y, x3, w, b, *, interpret):
    B, N, C = x3.shape
    Ci = y.shape[-1]
    TB = _tb_tile(N, C, Ci, x3.dtype.itemsize)
    pad = (-B) % TB
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
        x3 = jnp.pad(x3, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    x_spec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, permute=False),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x3.dtype),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, Ci), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            x_spec,
            pl.BlockSpec((Ci, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * C * Ci,
            bytes_accessed=Bp * N * (3 * C + Ci) * x3.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y, x3, w, b)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# public entry points — each dispatches kernel (TPU / interpret) vs pure-jnp
# fallback with identical numerics, so module structure never depends on
# the platform.
# ---------------------------------------------------------------------------


def gn_proj_in_temporal(x5, gn_scale, gn_bias, w, b, *, eps: float = 1e-6):
    """[B,F,H,W,C] -> GroupNorm(32) -> [B*H*W, F, Ci] proj_in tokens.

    Fuses the TemporalTransformer head (lvdm/modules/attention.py:299-321
    norm + rearrange + linear proj_in) into one pass."""
    B, F, H, W, C = x5.shape
    mul, add = group_norm_fold(x5, gn_scale, gn_bias, eps=eps)
    if _enabled("t", C):
        return _head_temporal(
            x5, mul, add, w.astype(x5.dtype), b.astype(jnp.float32).reshape(1, -1),
            interpret=_mode() == "interpret",
        )
    xn = (x5.astype(jnp.float32) * mul[:, None, None, None] +
          add[:, None, None, None]).astype(x5.dtype)
    h = xn.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
    return (
        jnp.dot(h, w.astype(x5.dtype), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x5.dtype)


def tail_temporal(y, x5, w, b):
    """proj_out -> permute back -> + residual: [BHW,F,Ci], [B,F,H,W,C] ->
    [B,F,H,W,C]."""
    if _enabled("t", x5.shape[-1]):
        return _tail_temporal(
            y, x5, w.astype(y.dtype), b.astype(jnp.float32).reshape(1, -1),
            interpret=_mode() == "interpret",
        )
    B, F, H, W, C = x5.shape
    o = (jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)
         + b.astype(jnp.float32)).astype(y.dtype)
    o = o.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4)
    return o + x5


def gn_proj_in_spatial(x4, gn_scale, gn_bias, w, b, *, eps: float = 1e-6):
    """[BF,H,W,C] -> GroupNorm(32) -> [BF, H*W, Ci] proj_in tokens (the
    SpatialTransformer head, lvdm/modules/attention.py:252-262)."""
    BF, H, W, C = x4.shape
    mul, add = group_norm_fold(x4, gn_scale, gn_bias, eps=eps)
    x3 = x4.reshape(BF, H * W, C)
    if _enabled("s", C):
        return _head_spatial(
            x3, mul, add, w.astype(x4.dtype), b.astype(jnp.float32).reshape(1, -1),
            interpret=_mode() == "interpret",
        )
    xn = (x3.astype(jnp.float32) * mul[:, None] + add[:, None]).astype(x4.dtype)
    return (
        jnp.dot(xn, w.astype(x4.dtype), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x4.dtype)


def _gn_silu_kernel(x_ref, mul_ref, add_ref, o_ref, *, act: bool):
    # x block [1, TM, C]; mul/add [1, 1, C] for this sample
    x = x_ref[:]
    h = x.astype(jnp.float32) * mul_ref[:] + add_ref[:]
    if act:
        h = h * jax.nn.sigmoid(h)
    o_ref[:] = h.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def _gn_silu_call(x3, mul, add, *, act, interpret):
    B, M, C = x3.shape
    # Mosaic: the block's sublane dim (TM) must be %8 or equal to M
    cap = max(8, min(M, (8 * 1024 * 1024) // (C * 8)))
    TM = M
    if M % 8 == 0:
        for cand in range(cap - cap % 8, 7, -8):
            if M % cand == 0:
                TM = cand
                break
    mul, add = mul[:, None, :], add[:, None, :]
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((B, M, C), x3.dtype),
        grid=(B, M // TM),
        in_specs=[
            pl.BlockSpec((1, TM, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TM, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * M * C,
            bytes_accessed=2 * B * M * C * x3.dtype.itemsize,
            transcendentals=B * M * C,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, mul, add)
    return out


# Measured per-site defaults: the gn_silu kernel loses at BOTH sites on
# TPU v5e — XLA fuses the normalize+SiLU epilogue into the consuming conv,
# while the fold+Pallas split re-reads x from HBM a third time.
#   unet: 808.1 ms/fwd off vs 844.7 on (results/ablate_latest.json
#         @ acee677, B=8 UNet fwd) — demoted in round 4 (a3e9ac5).
#   vae:  152.1 ms off vs 206.8 on per 16-frame window decode
#         (dev/bench_vae.py slope-timed K=1 vs K=2, round-5
#         results/vae_latest.json) — demoted in round 5.
# Override: DSCALER_GNSILU_SITES — comma list out of {unet, vae}; "" (the
# default) keeps the kernel off everywhere, "unet,vae" restores round-3.
_GNSILU_SITES = frozenset(
    s.strip()
    for s in os.environ.get("DSCALER_GNSILU_SITES", "").split(",")
    if s.strip()
)


def set_gnsilu_sites(spec: str) -> None:
    """Override the gn_silu per-site plan at runtime (same syntax as the
    DSCALER_GNSILU_SITES env var)."""
    global _GNSILU_SITES
    _GNSILU_SITES = frozenset(s.strip() for s in spec.split(",") if s.strip())


def gn_silu(x, gn_scale, gn_bias, *, eps: float = 1e-5, act: bool = True,
            site: str = "unet"):
    """GroupNorm(32) [-> SiLU] as one elementwise pass with precomputed
    folded statistics (the ResBlock / TemporalConvBlock prologue,
    openaimodel3d.py:115-309; VAE resnet/attn norms with eps=1e-6,
    ae_modules.py:19-23). x: [B, *spatial, C], stats per sample B.
    Kill switches: DSCALER_FUSE_DISABLE=gnsilu (all sites) and the
    per-site DSCALER_GNSILU_SITES plan (see _GNSILU_SITES above)."""
    B = x.shape[0]
    C = x.shape[-1]
    mul, add = group_norm_fold(x, gn_scale, gn_bias, eps=eps)
    use_kernel = (
        _mode() != "off"
        and site in _GNSILU_SITES
        and not fused_temporal.kernel_disabled("gnsilu")
        and (_mode() == "interpret" or fused_temporal._tpu_available())
    )
    if use_kernel:
        x3 = x.reshape(B, -1, C)
        out = _gn_silu_call(x3, mul, add, act=act, interpret=_mode() == "interpret")
        return out.reshape(x.shape)
    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    h = x.astype(jnp.float32) * mul.reshape(bshape) + add.reshape(bshape)
    if act:
        h = h * jax.nn.sigmoid(h)
    return h.astype(x.dtype)


def tail_spatial(y, x4, w, b):
    """proj_out -> + residual: [BF,N,Ci], [BF,H,W,C] -> [BF,H,W,C]."""
    BF, H, W, C = x4.shape
    x3 = x4.reshape(BF, H * W, C)
    if _enabled("s", C):
        out = _tail_spatial(
            y, x3, w.astype(y.dtype), b.astype(jnp.float32).reshape(1, -1),
            interpret=_mode() == "interpret",
        )
        return out.reshape(BF, H, W, C)
    o = (jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)
         + b.astype(jnp.float32)).astype(y.dtype)
    return (o + x3).reshape(BF, H, W, C)
