"""Whole-transformer fused Pallas TPU kernels (depth-1 mega kernels).

The terminal fusion level for the UNet's transformers: ONE pallas_call per
Spatial/TemporalTransformer covering

    GroupNorm-normalize -> [frame-axis permute] -> proj_in
    -> LN -> attn1 -> +res -> LN -> attn2 -> +res -> LN -> GEGLU ff -> +res
    -> proj_out -> [permute back] -> + outer residual

so each transformer costs one GroupNorm statistics pass (XLA reduction)
plus one read + one write of the activation tensor. Compare:
~8 half-passes with the wrapper + whole-block kernels (ops/fused_twrap.py,
ops/fused_block.py), ~15-17 with per-sub-block kernels, and more on XLA.

Shipped VideoCrafter transformers are all depth 1 (configs
inference_{t2v,i2v}_512: transformer_depth 1), so this covers every
C <= 640 instance; C = 1280 levels use the wrapper + block kernels
(weights there exceed a comfortable VMEM budget alongside the tiles).

GroupNorm statistics are computed outside (ops/fused_twrap.group_norm_fold)
and folded to per-(sample, channel) scale/offset operands.

Reference semantics: lvdm/modules/attention.py:187-220 (block),
:223-278 (spatial wrapper), :281-373 (temporal wrapper). Parity with the
unfused module path is tested in interpret mode (tests/test_fused_mega.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamicscaler_tpu.ops import fused_temporal
from dynamicscaler_tpu.ops.fused_block import (
    _cross_attn,
    _geglu,
    _ln,
    _s_row_tile,
    _self_attn_blockdiag,
    _self_attn_full,
    prepare_context,
)
from dynamicscaler_tpu.ops.fused_twrap import group_norm_fold


def _mode() -> str:
    return fused_temporal.mode()


def _on() -> bool:
    if _mode() == "off" or fused_temporal.kernel_disabled("mega"):
        return False
    return _mode() == "interpret" or fused_temporal._tpu_available()


# ---------------------------------------------------------------------------
# temporal transformer mega kernel
# ---------------------------------------------------------------------------


def _t_th(F: int, H: int, W: int, C: int) -> int:
    """Rows of H per grid block: (TH*W*F) % 128 == 0 (block-diag attention)
    and the fp32 [TH*W*F, 8C] GEGLU transient bounded to ~24MB."""
    cap = max(1, (24 * 1024 * 1024) // (32 * C * W * F))
    th = 0
    for cand in range(1, min(cap, H) + 1):
        if H % cand == 0 and (cand * W * F) % 128 == 0:
            th = cand
    return th


def temporal_ok(F: int, C: int, inner: int, heads: int, H: int, W: int) -> bool:
    if not _on() or fused_temporal.kernel_disabled("mega_t"):
        return False
    if not fused_temporal.plan_allows("mega", "t", C):
        return False
    return (
        F >= 2
        and 128 % F == 0
        and inner == C
        and inner % heads == 0
        and inner <= 640
        and (inner // heads) % 8 == 0
        and _t_th(F, H, W, C) > 0
    )


def _t_mega_kernel(
    x_ref, mul_ref, add_ref, wi_ref, bi_ref,
    s1, b1, q1, k1, v1, o1, c1,
    s2, b2, q2, k2, v2, o2, c2,
    s3, b3, w1, bb1, w2, bb2,
    wo_ref, bo_ref, out_ref, *, heads, scale, eps,
):
    F, TH, W, C = x_ref.shape
    R = TH * W
    x = x_ref[:].reshape(F, R, C)
    # mul/add blocks are [1, 1, C] (unit sublane axis for Mosaic legality)
    xn = (
        x.astype(jnp.float32) * mul_ref[:] + add_ref[:]
    ).astype(x.dtype)
    h3 = jnp.transpose(xn, (1, 0, 2))  # [R, F, C] — VMEM-internal permute
    Ci = wi_ref.shape[1]
    T = R * F
    h = jnp.dot(h3.reshape(T, C), wi_ref[:], preferred_element_type=jnp.float32)
    h = (h + bi_ref[:].astype(jnp.float32)).astype(x.dtype)

    h = h + _self_attn_blockdiag(_ln(h, s1, b1, eps), (q1, k1, v1, o1, c1),
                                 heads, scale, F)
    h = h + _self_attn_blockdiag(_ln(h, s2, b2, eps), (q2, k2, v2, o2, c2),
                                 heads, scale, F)
    h = h + _geglu(_ln(h, s3, b3, eps), (w1, bb1, w2, bb2))

    o = jnp.dot(h, wo_ref[:], preferred_element_type=jnp.float32)
    o = (o + bo_ref[:].astype(jnp.float32)).astype(x.dtype)
    o = jnp.transpose(o.reshape(R, F, C), (1, 0, 2)).reshape(F, TH, W, C)
    out_ref[:] = o + x_ref[:]


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "eps", "interpret")
)
def _t_mega_call(x5, mul, add, w_in, b_in, lns, a1, a2, ff, w_out, b_out, *,
                 heads, scale, eps, interpret):
    B, F, H, W, C = x5.shape
    Ci = w_in.shape[1]
    TH = _t_th(F, H, W, C)
    x4 = x5.reshape(B * F, H, W, C)
    H2 = ff[0].shape[1]
    mul, add = mul[:, None, :], add[:, None, :]

    x_spec = pl.BlockSpec((F, TH, W, C), lambda bq, i: (bq, i, 0, 0),
                          memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((1, 1, C), lambda bq, i: (bq, 0, 0),
                           memory_space=pltpu.VMEM)
    w_cc = pl.BlockSpec((Ci, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM)
    s1, b1, s2, b2, s3, b3 = lns
    in_specs = (
        [x_spec, gn_spec, gn_spec,
         pl.BlockSpec((C, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM), vec]
        + [vec, vec] + [w_cc] * 4 + [vec]
        + [vec, vec] + [w_cc] * 4 + [vec]
        + [vec, vec]
        + [
            pl.BlockSpec((Ci, H2), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, Ci), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
            vec,
        ]
        + [pl.BlockSpec((Ci, C), lambda bq, i: (0, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((1, C), lambda bq, i: (0, 0), memory_space=pltpu.VMEM)]
    )
    T = B * H * W * F
    flops = (
        4 * T * C * Ci  # proj_in + proj_out
        + 2 * 8 * T * Ci * Ci + 2 * 4 * T * 128 * Ci  # two attn sub-blocks
        + 2 * T * Ci * H2 + T * H2 // 2 * Ci * 2  # GEGLU ff
    )
    out = pl.pallas_call(
        functools.partial(
            _t_mega_kernel, heads=heads, scale=scale, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((B * F, H, W, C), x5.dtype),
        grid=(B, H // TH),
        in_specs=in_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * T * C * 2
            + (2 * C * Ci + 8 * Ci * Ci + 3 * Ci * H2 // 2) * 2,
            transcendentals=T * 256 + T * H2 // 2,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x4, mul, add, w_in, b_in, s1, b1, *a1, s2, b2, *a2, s3, b3, *ff,
      w_out, b_out)
    return out.reshape(B, F, H, W, C)


def temporal_transformer(x5, gn_scale, gn_bias, w_in, b_in, lns, a1, a2, ff,
                         w_out, b_out, *, heads, scale,
                         gn_eps: float = 1e-6, eps: float = 1e-5):
    """Whole TemporalTransformer (GN -> permute -> proj_in -> block ->
    proj_out -> permute -> +residual) as one kernel. x5: [B,F,H,W,C];
    returns [B,F,H,W,C]. Caller must have checked ``temporal_ok``."""
    dt = x5.dtype
    mul, add = group_norm_fold(x5, gn_scale, gn_bias, eps=gn_eps)
    to2d = lambda t: t.reshape(1, -1).astype(jnp.float32)
    wc = lambda t: t.astype(dt)
    return _t_mega_call(
        x5, mul, add, wc(w_in), to2d(b_in),
        tuple(to2d(t) for t in lns),
        tuple(wc(w) for w in a1[:4]) + (to2d(a1[4]),),
        tuple(wc(w) for w in a2[:4]) + (to2d(a2[4]),),
        (wc(ff[0]), to2d(ff[1]), wc(ff[2]), to2d(ff[3])),
        wc(w_out), to2d(b_out),
        heads=heads, scale=float(scale),
        eps=float(eps), interpret=_mode() == "interpret",
    )


# ---------------------------------------------------------------------------
# spatial transformer mega kernel
# ---------------------------------------------------------------------------


def spatial_ok(N: int, C: int, inner: int, heads: int, ctx_dim: int) -> bool:
    if not _on() or fused_temporal.kernel_disabled("mega_s"):
        return False
    if not fused_temporal.plan_allows("mega", "s", C):
        return False
    return (
        256 <= N <= 4096
        and N % 16 == 0
        and inner == C
        and inner % heads == 0
        and inner <= 640
        and (inner // heads) % 8 == 0
        and ctx_dim % 128 == 0
    )


def _s_mega_kernel(*refs, heads, scale, eps, text_len, img_len, has_img):
    if has_img:
        (x_ref, mul_ref, add_ref, ctxt_ref, ctxi_ref, wi_ref, bi_ref,
         s1, b1, q1, k1, v1, o1, c1,
         s2, b2, q2, k2, v2, ki2, vi2, o2, c2,
         s3, b3, w1, bb1, w2, bb2, wo_ref, bo_ref, out_ref) = refs
        ctx_refs = (ctxt_ref, ctxi_ref)
        a2 = (q2, k2, v2, ki2, vi2, o2, c2)
    else:
        (x_ref, mul_ref, add_ref, ctxt_ref, wi_ref, bi_ref,
         s1, b1, q1, k1, v1, o1, c1,
         s2, b2, q2, k2, v2, o2, c2,
         s3, b3, w1, bb1, w2, bb2, wo_ref, bo_ref, out_ref) = refs
        ctx_refs = (ctxt_ref,)
        a2 = (q2, k2, v2, o2, c2)
    TB, N, C = x_ref.shape
    x = x_ref[:]
    # mul/add blocks are [TB, 1, C] (unit sublane axis for Mosaic legality)
    xn = (
        x.astype(jnp.float32) * mul_ref[:] + add_ref[:]
    ).astype(x.dtype)
    Ci = wi_ref.shape[1]
    T = TB * N
    h = jnp.dot(xn.reshape(T, C), wi_ref[:], preferred_element_type=jnp.float32)
    h = (h + bi_ref[:].astype(jnp.float32)).astype(x.dtype)

    h = h + _self_attn_full(
        _ln(h, s1, b1, eps).reshape(TB, N, Ci), (q1, k1, v1, o1, c1),
        heads, scale,
    ).reshape(T, Ci)
    h = h + _cross_attn(
        _ln(h, s2, b2, eps).reshape(TB, N, Ci), ctx_refs, a2,
        heads, scale, text_len, img_len, has_img,
    ).reshape(T, Ci)
    h = h + _geglu(_ln(h, s3, b3, eps), (w1, bb1, w2, bb2))

    o = jnp.dot(h, wo_ref[:], preferred_element_type=jnp.float32)
    o = (o + bo_ref[:].astype(jnp.float32)).astype(x.dtype)
    out_ref[:] = o.reshape(TB, N, C) + x


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "eps", "text_len",
                     "img_len", "has_img", "interpret"),
)
def _s_mega_call(x3, mul, add, ctx_t, ctx_i, w_in, b_in, lns, a1, a2, ff,
                 w_out, b_out, *, heads, scale, eps, text_len,
                 img_len, has_img, interpret):
    B, N, C = x3.shape
    Ci = w_in.shape[1]
    Lt, Dc = ctx_t.shape[1:]
    Li = ctx_i.shape[1] if has_img else 0
    # the mega kernel carries ~2 extra activation copies (proj_in/out)
    TB = _s_row_tile(N, max(C, Ci), x3.dtype.itemsize, copies=16)
    pad = (-B) % TB
    if pad:
        x3 = jnp.pad(x3, ((0, pad), (0, 0), (0, 0)))
        mul = jnp.pad(mul, ((0, pad), (0, 0)))
        add = jnp.pad(add, ((0, pad), (0, 0)))
        ctx_t = jnp.pad(ctx_t, ((0, pad), (0, 0), (0, 0)))
        if has_img:
            ctx_i = jnp.pad(ctx_i, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    H2 = ff[0].shape[1]
    mul, add = mul[:, None, :], add[:, None, :]

    x_spec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((TB, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ctxt_spec = pl.BlockSpec((TB, Lt, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_cc = pl.BlockSpec((Ci, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w_dc = pl.BlockSpec((Dc, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM)
    s1, b1, s2, b2, s3, b3 = lns

    a2_specs = [w_cc, w_dc, w_dc] + ([w_dc, w_dc] if has_img else []) + [w_cc, vec]
    in_specs = (
        [x_spec, gn_spec, gn_spec, ctxt_spec]
        + ([pl.BlockSpec((TB, Li, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
           if has_img else [])
        + [pl.BlockSpec((C, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM), vec]
        + [vec, vec] + [w_cc] * 4 + [vec]
        + [vec, vec] + a2_specs
        + [vec, vec]
        + [
            pl.BlockSpec((Ci, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, Ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec,
        ]
        + [pl.BlockSpec((Ci, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    )
    operands = (
        (x3, mul, add, ctx_t) + ((ctx_i,) if has_img else ())
        + (w_in, b_in) + (s1, b1) + a1 + (s2, b2) + a2 + (s3, b3) + ff
        + (w_out, b_out)
    )
    L = Lt + Li
    T = Bp * N
    flops = (
        4 * T * C * Ci
        + 8 * T * Ci * Ci + 4 * T * N * Ci
        + 4 * T * Ci * Ci + (8 if has_img else 4) * Bp * Lt * Dc * Ci
        + 4 * T * L * Ci
        + 2 * T * Ci * H2 + T * H2 // 2 * Ci * 2
    )
    out = pl.pallas_call(
        functools.partial(
            _s_mega_kernel, heads=heads, scale=scale, eps=eps,
            text_len=text_len, img_len=img_len, has_img=has_img,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x3.dtype),
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * T * C * 2 + Bp * L * Dc * 2
            + (2 * C * Ci + 6 * Ci * Ci + 3 * Ci * H2 // 2
               + (4 if has_img else 2) * Dc * Ci) * 2,
            transcendentals=Bp * heads * N * (N + L) + T * H2 // 2,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:B] if pad else out


def spatial_transformer(x4, ctx, gn_scale, gn_bias, w_in, b_in, lns, a1, a2,
                        ff, w_out, b_out, *, heads, scale,
                        text_len: int = 77, gn_eps: float = 1e-6,
                        eps: float = 1e-5):
    """Whole SpatialTransformer (GN -> proj_in -> block -> proj_out ->
    +residual) as one kernel. x4: [BF,H,W,C]; ctx: [BF,L,Dc]. Returns
    [BF,H,W,C]. Caller must have checked ``spatial_ok``."""
    BF, H, W, C = x4.shape
    dt = x4.dtype
    mul, add = group_norm_fold(x4, gn_scale, gn_bias, eps=gn_eps)
    x3 = x4.reshape(BF, H * W, C)
    has_img = len(a2) == 7
    ctx_t, ctx_i, text_len, img_len = prepare_context(ctx, text_len, has_img, dt)

    to2d = lambda t: t.reshape(1, -1).astype(jnp.float32)
    wc = lambda t: t.astype(dt)
    out = _s_mega_call(
        x3, mul, add, ctx_t, ctx_i, wc(w_in), to2d(b_in),
        tuple(to2d(t) for t in lns),
        tuple(wc(w) for w in a1[:4]) + (to2d(a1[4]),),
        tuple(wc(w) for w in a2[:-1]) + (to2d(a2[-1]),),
        (wc(ff[0]), to2d(ff[1]), wc(ff[2]), to2d(ff[3])),
        wc(w_out), to2d(b_out),
        heads=heads, scale=float(scale), eps=float(eps),
        text_len=int(text_len), img_len=int(img_len), has_img=has_img,
        interpret=_mode() == "interpret",
    )
    return out.reshape(BF, H, W, C)
