"""Fused Pallas TPU kernel for the UNet's spatial self-attention sub-blocks.

VideoCrafter's spatial transformers (lvdm/modules/attention.py:223-278)
attend over N = H*W tokens per (batch, frame) row — N = 2560/640/160 at the
native window sizes. XLA materializes the [rows, heads, N, N] logits/probs
tensors in HBM (at L1 that is ~8-17 GB of traffic per instance per forward;
dev/bench_spatial.py even OOMs the isolated sub-block), which makes the
sub-block HBM-bound far below the MXU roofline.

This kernel fuses LayerNorm -> QKV -> full N-token attention -> out-proj
[-> +residual] with the logits resident in VMEM only:

* grid over batch rows (``TB`` rows per block, 1 at N=2560);
* projections are [TB*N, C] @ [C, C] MXU matmuls on VMEM data;
* per head: ``logits = Q_h @ K_h^T`` ([N, N] fp32, never written to HBM),
  fp32 softmax, ``P @ V_h``;
* d = 64 heads bound the attention matmuls at ~50% MXU (64-deep
  contraction / 64-wide output) — inherent to the checkpoint's head size.

Numerics match the unfused path (flax LayerNorm fast-variance in fp32,
bf16 matmul inputs, fp32 softmax) to bf16 rounding; parity is tested in
interpret mode on CPU (tests/test_fused_spatial.py).
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
    return fused_temporal.mode()  # shared auto/off/interpret switch


def fusable(n_tokens: int, inner: int, query_dim: int, heads: int) -> bool:
    """Gate for the fused spatial self-attention kernel.

    Token counts must tile the (16, 128)-shaped bf16 VMEM layout; square
    projections (inner == query dim, true for all UNet spatial blocks);
    C <= 1280 — measured on v5e: x1.60 at (N=2560, C=320), x2.09 at
    (N=640, C=640); the (N=160, C=1280) mid/L3 site lost at x0.94 in r3
    but wins after normalize-after-PV + retuned row tiles (round-5 full-fwd
    A/B: 800.9 ms wide vs 810.3 off), so the wide gate is now the default.
    """
    if _mode() == "off" or fused_temporal.kernel_disabled("spatial"):
        return False
    if not (_mode() == "interpret" or fused_temporal._tpu_available()):
        return False
    # The wide gate admits the (N=160, C=1280) mid/L3 site. Measured ON by
    # default in round 5 (dev/ablate_unet.py full, B=8, v5e): full fwd
    # 800.9 ms wide vs 810.3 ms off — the r3 x0.94 loss flipped to a win
    # after normalize-after-PV + retuned row tiles. DSCALER_SPATIAL_WIDE=0
    # restores the narrow gate.
    wide = os.environ.get("DSCALER_SPATIAL_WIDE", "1") == "1"
    min_n, max_c = (128, 1280) if wide else (256, 640)
    return (
        min_n <= n_tokens <= 4096
        and n_tokens % 16 == 0
        and inner == query_dim
        and inner % heads == 0
        and inner <= max_c
        and (inner // heads) % 8 == 0
    )


def _row_tile(N: int, C: int, itemsize: int) -> int:
    """Rows per grid block: bound fp32 logits (TB*N*N*4) + tiles to VMEM.

    Budget 32MB: with double-buffered in/out windows, fp32 logits + exp,
    QKV and weights alongside, TB=6 at (N=640, C=640) measured 130.6M vmem
    (> the 128M limit) inside the full UNet — 32MB keeps TB=4 there and
    TB=1 at (N=2560, C=320)."""
    budget = 32 * 1024 * 1024
    tb = max(1, budget // (N * N * 4 + 8 * N * C * itemsize))
    return min(tb, 8)


def _kernel(x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, scale: float, eps: float, add_residual: bool):
    TB, N, C = x_ref.shape
    d = C // heads
    x = x_ref[:].reshape(TB * N, C)

    # LayerNorm (flax fast-variance semantics, fp32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * s_ref[:].astype(jnp.float32)
    h = ((xf - mu) * mul + b_ref[:].astype(jnp.float32)).astype(x.dtype)

    # QKV projections — MXU matmuls on VMEM-resident data
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)

    q = q.reshape(TB, N, C)
    k = k.reshape(TB, N, C)
    v = v.reshape(TB, N, C)

    outs = []
    for hh in range(heads):
        qh = q[..., hh * d:(hh + 1) * d]
        kh = k[..., hh * d:(hh + 1) * d]
        vh = v[..., hh * d:(hh + 1) * d]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TB, N, N] fp32 — VMEM only
        logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        # normalize AFTER the PV matmul: N*d divisions instead of N*N
        denom = jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            e.astype(x.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append((oh / denom).astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1).reshape(TB * N, C)

    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out.astype(x.dtype)
    if add_residual:
        out = out + x
    o_ref[:] = out.reshape(TB, N, C)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "eps", "add_residual", "interpret"),
)
def _fused_call(x, s, b, wq, wk, wv, wo, bo, *, heads, scale, eps,
                add_residual, interpret):
    B, N, C = x.shape
    TB = _row_tile(N, C, x.dtype.itemsize)
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    x_spec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    flops_mm = 8 * Bp * N * C * C  # 4 square projections
    flops_attn = 4 * Bp * N * N * C  # QK^T + PV
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, scale=scale, eps=eps, add_residual=add_residual
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x.dtype),
        grid=(Bp // TB,),
        in_specs=[x_spec, vec_spec, vec_spec, w_spec, w_spec, w_spec, w_spec, vec_spec],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + flops_attn,
            bytes_accessed=2 * Bp * N * C * 2 + 4 * C * C * 2,
            transcendentals=Bp * heads * N * N,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, s, b, wq, wk, wv, wo, bo)
    return out[:B] if pad else out


def cross_fusable(n_tokens: int, inner: int, query_dim: int, heads: int,
                  ctx_dim: int) -> bool:
    """Gate for the fused cross-attention sub-block kernel: LN -> Q proj ->
    dual text/image KV attention -> out-proj -> residual, weight-stationary
    per grid block. All UNet cross-attention levels qualify (context is
    77(+16) tokens — logits are tiny; the win is fusing the LN/projection
    HBM round trips)."""
    if _mode() == "off" or fused_temporal.kernel_disabled("cross"):
        return False
    if not (_mode() == "interpret" or fused_temporal._tpu_available()):
        return False
    return (
        128 <= n_tokens <= 4096
        and n_tokens % 16 == 0
        and inner == query_dim
        and inner % heads == 0
        and inner <= 1280
        and (inner // heads) % 8 == 0
        and ctx_dim % 128 == 0
    )


def _seg16(n: int) -> int:
    """Sublane-aligned segment length (bf16 tile sublane = 16). Mosaic
    cannot shape-cast [TB*L, Dc] <-> [TB, L, Dc] unless L % 16 == 0 —
    the 77-token text segment must be zero-padded and key-masked."""
    return max(16, -(-n // 16) * 16)


def _cross_kernel(*refs, heads: int, scale: float, eps: float, text_len: int,
                  img_len: int, has_img: bool, add_residual: bool):
    # operand list depends on has_img: the text-only variant carries no
    # image context / image-KV weights at all (5MB VMEM at C=1280)
    if has_img:
        (x_ref, ctxt_ref, ctxi_ref, s_ref, b_ref, wq_ref, wk_ref,
         wv_ref, wki_ref, wvi_ref, wo_ref, bo_ref, o_ref) = refs
    else:
        (x_ref, ctxt_ref, s_ref, b_ref, wq_ref, wk_ref,
         wv_ref, wo_ref, bo_ref, o_ref) = refs
    TB, N, C = x_ref.shape
    d = C // heads
    x = x_ref[:].reshape(TB * N, C)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * s_ref[:].astype(jnp.float32)
    h = ((xf - mu) * mul + b_ref[:].astype(jnp.float32)).astype(x.dtype)

    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
    q = q.reshape(TB, N, C)

    Lt, Dc = ctxt_ref.shape[1:]
    ctx_t = ctxt_ref[:].reshape(TB * Lt, Dc)
    k = jnp.dot(ctx_t, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(ctx_t, wv_ref[:], preferred_element_type=jnp.float32)
    k = k.astype(x.dtype).reshape(TB, Lt, C)
    v = v.astype(x.dtype).reshape(TB, Lt, C)
    # compile-time -inf mask on the zero-padded key columns
    tmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Lt), 2) < text_len, 0.0, -1e30
    ).astype(jnp.float32)
    if has_img:
        Li = ctxi_ref.shape[1]
        ctx_i = ctxi_ref[:].reshape(TB * Li, Dc)
        ki = jnp.dot(ctx_i, wki_ref[:], preferred_element_type=jnp.float32)
        vi = jnp.dot(ctx_i, wvi_ref[:], preferred_element_type=jnp.float32)
        ki = ki.astype(x.dtype).reshape(TB, Li, C)
        vi = vi.astype(x.dtype).reshape(TB, Li, C)
        imask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, Li), 2) < img_len,
            0.0, -1e30,
        ).astype(jnp.float32)

    def attend(qh, kh, vh, mask):
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            e.astype(qh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return oh / denom

    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        oh = attend(q[..., sl], k[..., sl], v[..., sl], tmask)
        if has_img:
            # image_cross_attention_scale = 1.0 (attention.py:116-124)
            oh = oh + attend(q[..., sl], ki[..., sl], vi[..., sl], imask)
        outs.append(oh.astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1).reshape(TB * N, C)

    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out.astype(x.dtype)
    if add_residual:
        out = out + x
    o_ref[:] = out.reshape(TB, N, C)


def _cross_row_tile(N: int, C: int, L: int, itemsize: int) -> int:
    budget = 24 * 1024 * 1024
    per_row = N * C * 6 * itemsize + 2 * N * L * 4 + L * C * 4 * itemsize
    return min(8, max(1, budget // per_row))


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "eps", "text_len", "img_len",
                     "has_img", "add_residual", "interpret"),
)
def _fused_cross_call(x, ctx_t, ctx_i, s, b, wq, wk, wv, wki, wvi, wo, bo, *,
                      heads, scale, eps, text_len, img_len, has_img,
                      add_residual, interpret):
    B, N, C = x.shape
    Lt, Dc = ctx_t.shape[1:]
    Li = ctx_i.shape[1] if has_img else 0
    TB = _cross_row_tile(N, C, Lt + Li, x.dtype.itemsize)
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ctx_t = jnp.pad(ctx_t, ((0, pad), (0, 0), (0, 0)))
        if has_img:
            ctx_i = jnp.pad(ctx_i, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    x_spec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ctxt_spec = pl.BlockSpec((TB, Lt, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wq_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wk_spec = pl.BlockSpec((Dc, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    if has_img:
        ctxi_spec = pl.BlockSpec(
            (TB, Li, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [x_spec, ctxt_spec, ctxi_spec, vec_spec, vec_spec, wq_spec,
                    wk_spec, wk_spec, wk_spec, wk_spec, wq_spec, vec_spec]
        operands = (x, ctx_t, ctx_i, s, b, wq, wk, wv, wki, wvi, wo, bo)
    else:
        in_specs = [x_spec, ctxt_spec, vec_spec, vec_spec, wq_spec,
                    wk_spec, wk_spec, wq_spec, vec_spec]
        operands = (x, ctx_t, s, b, wq, wk, wv, wo, bo)

    L = Lt + Li
    flops = (
        4 * Bp * N * C * C  # q + out proj
        + (8 if has_img else 4) * Bp * Lt * Dc * C  # kv projections
        + 4 * Bp * N * L * C  # attention
    )
    out = pl.pallas_call(
        functools.partial(
            _cross_kernel, heads=heads, scale=scale, eps=eps,
            text_len=text_len, img_len=img_len, has_img=has_img,
            add_residual=add_residual,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x.dtype),
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Bp * N * C * 2 + Bp * L * Dc * 2
            + (2 * C * C + 4 * Dc * C) * 2,
            transcendentals=Bp * heads * N * L,
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


def fused_ln_cross_attention(
    x: jnp.ndarray,  # [B, N, C]
    ctx: jnp.ndarray,  # [B, L, Dc] (text[:text_len] ; image[text_len:])
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray,  # [C, C]
    wk: jnp.ndarray,  # [Dc, C]
    wv: jnp.ndarray,
    wo: jnp.ndarray,  # [C, C]
    bo: jnp.ndarray,
    wk_ip: jnp.ndarray = None,  # [Dc, C] dual image-KV (attention.py:116-124)
    wv_ip: jnp.ndarray = None,
    *,
    heads: int,
    scale: float,
    text_len: int = 77,
    eps: float = 1e-5,
    add_residual: bool = True,
) -> jnp.ndarray:
    """LayerNorm -> Q proj -> text (+image) cross-attention -> out-proj
    [-> +x] as one Pallas kernel. Caller must have checked
    ``cross_fusable``.

    The text and image context segments are passed to the kernel as
    separate operands, each zero-padded to a sublane-aligned length
    (Mosaic rejects the [TB, 77, Dc] shape cast) with the padded key
    columns masked out of their softmax."""
    B, N, C = x.shape
    has_img = wk_ip is not None
    ctx = ctx.astype(x.dtype)
    if not has_img:
        text_len = ctx.shape[1]
        # placeholders for the jit signature — DCE'd (has_img=False variant
        # never loads image context / image-KV weights into VMEM)
        wk_ip = jnp.zeros((1, 1), wk.dtype)
        wv_ip = jnp.zeros((1, 1), wv.dtype)
        ctx_t, img_len = ctx, 0
        ctx_i = jnp.zeros((1, 1, 1), ctx.dtype)
    else:
        ctx_t = ctx[:, :text_len]
        ctx_i = ctx[:, text_len:]
        img_len = ctx_i.shape[1]
        ctx_i = jnp.pad(ctx_i, ((0, 0), (0, _seg16(img_len) - img_len), (0, 0)))
    ctx_t = jnp.pad(
        ctx_t, ((0, 0), (0, _seg16(text_len) - ctx_t.shape[1]), (0, 0))
    )
    to2d = lambda t: t.reshape(1, C)
    return _fused_cross_call(
        x,
        ctx_t,
        ctx_i,
        to2d(ln_scale.astype(jnp.float32)),
        to2d(ln_bias.astype(jnp.float32)),
        wq.astype(x.dtype),
        wk.astype(x.dtype),
        wv.astype(x.dtype),
        wk_ip.astype(x.dtype),
        wv_ip.astype(x.dtype),
        wo.astype(x.dtype),
        to2d(bo.astype(jnp.float32)),
        heads=heads,
        scale=float(scale),
        eps=float(eps),
        text_len=int(text_len),
        img_len=int(img_len),
        has_img=has_img,
        add_residual=add_residual,
        interpret=_mode() == "interpret",
    )


def fused_ln_spatial_attention(
    x: jnp.ndarray,  # [B, N, C]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    *,
    heads: int,
    scale: float,
    eps: float = 1e-5,
    add_residual: bool = True,
) -> jnp.ndarray:
    """LayerNorm -> QKV -> N-token self-attention -> out-proj [-> +x] as one
    Pallas kernel. x: [B, N, C]; weights [C, C] (flax Dense layout);
    ln_scale/ln_bias/bo: [C]. Caller must have checked ``fusable``."""
    B, N, C = x.shape
    assert wq.shape == (C, C) and wo.shape == (C, C), (wq.shape, wo.shape)
    to2d = lambda t: t.reshape(1, C)
    return _fused_call(
        x,
        to2d(ln_scale.astype(jnp.float32)),
        to2d(ln_bias.astype(jnp.float32)),
        wq.astype(x.dtype),
        wk.astype(x.dtype),
        wv.astype(x.dtype),
        wo.astype(x.dtype),
        to2d(bo.astype(jnp.float32)),
        heads=heads,
        scale=float(scale),
        eps=float(eps),
        add_residual=add_residual,
        interpret=_mode() == "interpret",
    )
