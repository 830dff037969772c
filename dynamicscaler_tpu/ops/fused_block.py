"""Whole-transformer-block fused Pallas TPU kernels.

One UNet BasicTransformerBlock (lvdm/modules/attention.py:187-220) is
three pre-LN sub-blocks over the same activation tensor:

    x += attn1(LN1(x))            # self attention
    x += attn2(LN2(x), context)   # self (temporal) or text+image cross
    x += GEGLU_ff(LN3(x))

The round-2/3 kernels fused each sub-block individually (ops/
fused_temporal.py, ops/fused_spatial.py) — still three HBM read+write
round-trips per block. These kernels run the *entire block* in one
pallas_call: the activation tile stays in VMEM across all three
sub-blocks, so the block costs one read + one write of the tensor plus
the (VMEM-resident, grid-constant) weights.

Variants:

* ``temporal_block``: attn1 and attn2 are both F-token self-attentions
  (shipped configs set temporal_selfatt_only; attention.py:348-352) using
  the 128-token block-diagonal MXU trick from ops/fused_temporal.py.
* ``spatial_block``: attn1 is an N=H*W-token self-attention with fp32
  logits VMEM-only (ops/fused_spatial.py design); attn2 is the dual
  text(+image)-KV cross attention with sublane-aligned context operands.

Numerics match the per-sub-block kernels (fp32 LN stats / softmax, bf16
matmul inputs, fp32 accumulation) to bf16 rounding; parity is tested in
interpret mode on CPU (tests/test_fused_block.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamicscaler_tpu.ops import fused_temporal
from dynamicscaler_tpu.ops.fused_temporal import _erf


def _mode() -> str:
    return fused_temporal.mode()


def _on(kind: str) -> bool:
    if _mode() == "off" or fused_temporal.kernel_disabled(kind):
        return False
    return _mode() == "interpret" or fused_temporal._tpu_available()


# ---------------------------------------------------------------------------
# VMEM math helpers (operate on loaded arrays inside a kernel)
# ---------------------------------------------------------------------------


def _ln(x2d, s_ref, b_ref, eps):
    xf = x2d.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * s_ref[:].astype(jnp.float32)
    return ((xf - mu) * mul + b_ref[:].astype(jnp.float32)).astype(x2d.dtype)


def _proj(h2d, w_ref, out_dtype=None):
    o = jnp.dot(h2d, w_ref[:], preferred_element_type=jnp.float32)
    return o.astype(out_dtype or h2d.dtype)


def _self_attn_blockdiag(h2d, refs, heads, scale, T):
    """F-token self attention over [T, C] rows grouped 128-token
    block-diagonal (T % 128 == 0); F divides 128."""
    wq_ref, wk_ref, wv_ref, wo_ref, bo_ref = refs
    C = h2d.shape[-1]
    d = C // heads
    F = T  # token length per row — caller reshapes
    q = _proj(h2d, wq_ref)
    k = _proj(h2d, wk_ref)
    v = _proj(h2d, wv_ref)
    n = h2d.shape[0]
    nG = n // 128
    ti = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // F
    tj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // F
    neg = jnp.where(ti == tj, 0.0, -1e30).astype(jnp.float32)
    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        qh = q[:, sl].reshape(nG, 128, d)
        kh = k[:, sl].reshape(nG, 128, d)
        vh = v[:, sl].reshape(nG, 128, d)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale + neg[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(h2d.dtype)
        oh = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(oh.astype(h2d.dtype).reshape(n, d))
    o = jnp.concatenate(outs, axis=-1)
    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    return (out + bo_ref[:].astype(jnp.float32)).astype(h2d.dtype)


def _self_attn_full(h3d, refs, heads, scale):
    """Full N-token self attention over [TB, N, C] with fp32 logits in
    VMEM (ops/fused_spatial.py design)."""
    wq_ref, wk_ref, wv_ref, wo_ref, bo_ref = refs
    TB, N, C = h3d.shape
    d = C // heads
    h2 = h3d.reshape(TB * N, C)
    q = _proj(h2, wq_ref).reshape(TB, N, C)
    k = _proj(h2, wk_ref).reshape(TB, N, C)
    v = _proj(h2, wv_ref).reshape(TB, N, C)
    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        logits = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            e.astype(h3d.dtype), v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append((oh / denom).astype(h3d.dtype))
    o = jnp.concatenate(outs, axis=-1).reshape(TB * N, C)
    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    return (out + bo_ref[:].astype(jnp.float32)).astype(h3d.dtype)


def _cross_attn(h3d, ctx_refs, refs, heads, scale, text_len, img_len, has_img):
    """Dual text(+image)-KV cross attention (attention.py:116-124) over
    [TB, N, C] queries; context operands are sublane-aligned and padded
    key columns masked (ops/fused_spatial.py design)."""
    if has_img:
        ctxt_ref, ctxi_ref = ctx_refs
        wq_ref, wk_ref, wv_ref, wki_ref, wvi_ref, wo_ref, bo_ref = refs
    else:
        (ctxt_ref,) = ctx_refs
        wq_ref, wk_ref, wv_ref, wo_ref, bo_ref = refs
    TB, N, C = h3d.shape
    d = C // heads
    q = _proj(h3d.reshape(TB * N, C), wq_ref).reshape(TB, N, C)

    Lt, Dc = ctxt_ref.shape[1:]
    ctx_t = ctxt_ref[:].reshape(TB * Lt, Dc)
    k = _proj(ctx_t, wk_ref, h3d.dtype).reshape(TB, Lt, C)
    v = _proj(ctx_t, wv_ref, h3d.dtype).reshape(TB, Lt, C)
    tmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Lt), 2) < text_len, 0.0, -1e30
    ).astype(jnp.float32)
    if has_img:
        Li = ctxi_ref.shape[1]
        ctx_i = ctxi_ref[:].reshape(TB * Li, Dc)
        ki = _proj(ctx_i, wki_ref, h3d.dtype).reshape(TB, Li, C)
        vi = _proj(ctx_i, wvi_ref, h3d.dtype).reshape(TB, Li, C)
        imask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, Li), 2) < img_len, 0.0, -1e30
        ).astype(jnp.float32)

    def attend(qh, kh, vh, mask):
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
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
            oh = oh + attend(q[..., sl], ki[..., sl], vi[..., sl], imask)
        outs.append(oh.astype(h3d.dtype))
    o = jnp.concatenate(outs, axis=-1).reshape(TB * N, C)
    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    return (out + bo_ref[:].astype(jnp.float32)).astype(h3d.dtype)


def _geglu(h2d, refs):
    w1_ref, b1_ref, w2_ref, b2_ref = refs
    a = jnp.dot(h2d, w1_ref[:], preferred_element_type=jnp.float32)
    a = (a + b1_ref[:].astype(jnp.float32)).astype(h2d.dtype)
    half = a.shape[-1] // 2
    val, gate = a[:, :half], a[:, half:]
    gf = gate.astype(jnp.float32)
    gelu = gf * 0.5 * (1.0 + _erf(gf * (1.0 / np.sqrt(2.0))))
    inner = (val.astype(jnp.float32) * gelu).astype(h2d.dtype)
    out = jnp.dot(inner, w2_ref[:], preferred_element_type=jnp.float32)
    return (out + b2_ref[:].astype(jnp.float32)).astype(h2d.dtype)


# ---------------------------------------------------------------------------
# temporal block (self + self + ff) — token length F, rows tiled
# ---------------------------------------------------------------------------


def temporal_block_fusable(n_tokens: int, inner: int, query_dim: int,
                           heads: int) -> bool:
    if not _on("block") or not fused_temporal.plan_allows("block", "t", query_dim):
        return False
    return (
        n_tokens >= 2
        and 128 % n_tokens == 0
        and inner == query_dim
        and inner % heads == 0
        and inner <= 1280
        and (inner // heads) % 8 == 0
    )


def _temporal_block_kernel(
    x_ref, s1, b1, q1, k1, v1, o1, c1, s2, b2, q2, k2, v2, o2, c2,
    s3, b3, w1, bb1, w2, bb2, out_ref, *, heads, scale, eps,
):
    TR, F, C = x_ref.shape
    T = TR * F
    x = x_ref[:].reshape(T, C)
    h = x + _self_attn_blockdiag(_ln(x, s1, b1, eps), (q1, k1, v1, o1, c1),
                                 heads, scale, F)
    h = h + _self_attn_blockdiag(_ln(h, s2, b2, eps), (q2, k2, v2, o2, c2),
                                 heads, scale, F)
    h = h + _geglu(_ln(h, s3, b3, eps), (w1, bb1, w2, bb2))
    out_ref[:] = h.reshape(TR, F, C)


def _t_row_tile(F: int, C: int, itemsize: int) -> int:
    # bound the fp32 [TR*F, 4C] GEGLU transient + qkv copies; weights are
    # grid-constant (fetched once)
    if C <= 320:
        tr = 64
    elif C <= 640:
        tr = 32
    else:
        tr = 8
    if itemsize > 2:
        tr = max(tr // 2, 8)
    while (tr * F) % 128:
        tr *= 2
    return tr


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "eps", "interpret")
)
def _temporal_block_call(x, lns, a1, a2, ff, *, heads, scale, eps, interpret):
    R, F, C = x.shape
    TR = _t_row_tile(F, C, x.dtype.itemsize)
    pad = (-R) % TR
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Rp = R + pad
    H2 = ff[0].shape[1]

    x_spec = pl.BlockSpec((TR, F, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    s1, b1, s2, b2, s3, b3 = lns
    in_specs = (
        [x_spec]
        + [vec, vec] + [w_spec] * 4 + [vec]
        + [vec, vec] + [w_spec] * 4 + [vec]
        + [vec, vec]
        + [
            pl.BlockSpec((C, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec,
        ]
    )
    flops = (
        2 * 8 * Rp * F * C * C  # 2 attn sub-blocks x 4 projections
        + 2 * 4 * Rp * F * 128 * C  # 2 x masked 128-block attention
        + 2 * Rp * F * C * H2 + Rp * F * H2 // 2 * C * 2  # GEGLU ff
    )
    out = pl.pallas_call(
        functools.partial(_temporal_block_kernel, heads=heads, scale=scale, eps=eps),
        out_shape=jax.ShapeDtypeStruct((Rp, F, C), x.dtype),
        grid=(Rp // TR,),
        in_specs=in_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Rp * F * C * 2 + (8 * C * C + C * H2 * 3 // 2) * 2,
            transcendentals=Rp * F * 256 + Rp * F * H2 // 2,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, s1, b1, *a1, s2, b2, *a2, s3, b3, *ff)
    return out[:R] if pad else out


def fused_temporal_block(x, lns, attn1, attn2, ff, *, heads, scale,
                         eps: float = 1e-5):
    """x: [rows, F, C]; lns: 6 LN vectors (s1,b1,s2,b2,s3,b3);
    attn1/attn2: (wq, wk, wv, wo, bo); ff: (w1, b1, w2, b2).
    Runs the whole temporal BasicTransformerBlock in one kernel."""
    R, F, C = x.shape
    dt = x.dtype
    to2d = lambda t: t.reshape(1, -1).astype(jnp.float32)
    wcast = lambda t: t.astype(dt)
    lns_p = tuple(to2d(t) for t in lns)
    a1 = tuple(wcast(w) for w in attn1[:4]) + (to2d(attn1[4]),)
    a2 = tuple(wcast(w) for w in attn2[:4]) + (to2d(attn2[4]),)
    ffp = (wcast(ff[0]), to2d(ff[1]), wcast(ff[2]), to2d(ff[3]))
    return _temporal_block_call(
        x, lns_p, a1, a2, ffp,
        heads=heads, scale=float(scale), eps=float(eps),
        interpret=_mode() == "interpret",
    )


# ---------------------------------------------------------------------------
# spatial block (self + cross + ff) — token length N = H*W, batch tiled
# ---------------------------------------------------------------------------


def spatial_block_fusable(n_tokens: int, inner: int, query_dim: int,
                          heads: int, ctx_dim: int) -> bool:
    if not _on("block") or not fused_temporal.plan_allows("block", "s", query_dim):
        return False
    return (
        256 <= n_tokens <= 4096
        and n_tokens % 16 == 0
        and inner == query_dim
        and inner % heads == 0
        and inner <= 640  # L3/mid self-attn stays on XLA (x0.94 fused)
        and (inner // heads) % 8 == 0
        and ctx_dim % 128 == 0
    )


def _spatial_block_kernel(*refs, heads, scale, eps, text_len, img_len,
                          has_img):
    if has_img:
        (x_ref, ctxt_ref, ctxi_ref,
         s1, b1, q1, k1, v1, o1, c1,
         s2, b2, q2, k2, v2, ki2, vi2, o2, c2,
         s3, b3, w1, bb1, w2, bb2, out_ref) = refs
        ctx_refs = (ctxt_ref, ctxi_ref)
        a2 = (q2, k2, v2, ki2, vi2, o2, c2)
    else:
        (x_ref, ctxt_ref,
         s1, b1, q1, k1, v1, o1, c1,
         s2, b2, q2, k2, v2, o2, c2,
         s3, b3, w1, bb1, w2, bb2, out_ref) = refs
        ctx_refs = (ctxt_ref,)
        a2 = (q2, k2, v2, o2, c2)
    TB, N, C = x_ref.shape
    x = x_ref[:]
    x2 = x.reshape(TB * N, C)
    h = x2 + _self_attn_full(
        _ln(x2, s1, b1, eps).reshape(TB, N, C), (q1, k1, v1, o1, c1),
        heads, scale,
    ).reshape(TB * N, C)
    h = h + _cross_attn(
        _ln(h, s2, b2, eps).reshape(TB, N, C), ctx_refs, a2,
        heads, scale, text_len, img_len, has_img,
    ).reshape(TB * N, C)
    h = h + _geglu(_ln(h, s3, b3, eps), (w1, bb1, w2, bb2))
    out_ref[:] = h.reshape(TB, N, C)


def _s_row_tile(N: int, C: int, itemsize: int, copies: int = 14) -> int:
    # fp32 [N, N] logits + the fp32 [TB*N, 8C] GEGLU transient dominate;
    # activation copies (qkv etc.; the mega kernel adds proj_in/out) ride
    # alongside. Shared with ops/fused_mega.py.
    budget = 40 * 1024 * 1024
    per_row = N * N * 4 + 8 * N * C * 4 + copies * N * C * itemsize
    return min(8, max(1, budget // per_row))


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "eps", "text_len", "img_len",
                     "has_img", "interpret"),
)
def _spatial_block_call(x, ctx_t, ctx_i, lns, a1, a2, ff, *, heads, scale,
                        eps, text_len, img_len, has_img, interpret):
    B, N, C = x.shape
    Lt, Dc = ctx_t.shape[1:]
    Li = ctx_i.shape[1] if has_img else 0
    TB = _s_row_tile(N, C, x.dtype.itemsize)
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ctx_t = jnp.pad(ctx_t, ((0, pad), (0, 0), (0, 0)))
        if has_img:
            ctx_i = jnp.pad(ctx_i, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    H2 = ff[0].shape[1]

    x_spec = pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ctxt_spec = pl.BlockSpec((TB, Lt, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_cc = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w_dc = pl.BlockSpec((Dc, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    s1, b1, s2, b2, s3, b3 = lns

    a2_specs = [w_cc, w_dc, w_dc] + ([w_dc, w_dc] if has_img else []) + [w_cc, vec]
    in_specs = (
        [x_spec, ctxt_spec]
        + ([pl.BlockSpec((TB, Li, Dc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
           if has_img else [])
        + [vec, vec] + [w_cc] * 4 + [vec]
        + [vec, vec] + a2_specs
        + [vec, vec]
        + [
            pl.BlockSpec((C, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec,
        ]
    )
    operands = (
        (x, ctx_t) + ((ctx_i,) if has_img else ())
        + (s1, b1) + a1 + (s2, b2) + a2 + (s3, b3) + ff
    )
    L = Lt + Li
    flops = (
        8 * Bp * N * C * C + 4 * Bp * N * N * C  # self sub-block
        + 4 * Bp * N * C * C + (8 if has_img else 4) * Bp * Lt * Dc * C
        + 4 * Bp * N * L * C  # cross sub-block (q/out proj + kv + attn)
        + 2 * Bp * N * C * H2 + Bp * N * H2 // 2 * C * 2  # ff
    )
    out = pl.pallas_call(
        functools.partial(
            _spatial_block_kernel, heads=heads, scale=scale, eps=eps,
            text_len=text_len, img_len=img_len, has_img=has_img,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, N, C), x.dtype),
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Bp * N * C * 2 + Bp * L * Dc * 2
            + (6 * C * C + 3 * C * H2 // 2 + (4 if has_img else 2) * Dc * C) * 2,
            transcendentals=Bp * heads * N * (N + L) + Bp * N * H2 // 2,
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


def _seg16(n: int) -> int:
    return max(16, -(-n // 16) * 16)


def prepare_context(ctx, text_len: int, has_img: bool, dt):
    """Split a [B, L, Dc] context into sublane-aligned (padded to %16)
    text / image operands for the dual-KV cross attention. Returns
    (ctx_t, ctx_i, text_len, img_len); padded key columns are masked
    inside the kernels via text_len/img_len. Shared by the spatial
    whole-block (here) and mega (ops/fused_mega.py) kernels."""
    ctx = ctx.astype(dt)
    if has_img:
        ctx_t = ctx[:, :text_len]
        ctx_i = ctx[:, text_len:]
        img_len = ctx_i.shape[1]
        ctx_i = jnp.pad(ctx_i, ((0, 0), (0, _seg16(img_len) - img_len), (0, 0)))
    else:
        text_len = ctx.shape[1]
        img_len = 0
        ctx_t, ctx_i = ctx, jnp.zeros((1, 1, 1), dt)
    ctx_t = jnp.pad(ctx_t, ((0, 0), (0, _seg16(text_len) - ctx_t.shape[1]), (0, 0)))
    return ctx_t, ctx_i, text_len, img_len


def fused_spatial_block(x, ctx, lns, attn1, attn2, ff, *, heads, scale,
                        text_len: int = 77, eps: float = 1e-5):
    """x: [B, N, C] tokens; ctx: [B, L, Dc] (text[:text_len]; image rest),
    or None for pure self attn2 — not supported here (use temporal).
    attn1: (wq,wk,wv,wo,bo); attn2: (wq,wk,wv,wo,bo) or
    (wq,wk,wv,wk_ip,wv_ip,wo,bo); ff: (w1,b1,w2,b2)."""
    B, N, C = x.shape
    dt = x.dtype
    has_img = len(attn2) == 7
    ctx_t, ctx_i, text_len, img_len = prepare_context(ctx, text_len, has_img, dt)

    to2d = lambda t: t.reshape(1, -1).astype(jnp.float32)
    wcast = lambda t: t.astype(dt)
    lns_p = tuple(to2d(t) for t in lns)
    a1 = tuple(wcast(w) for w in attn1[:4]) + (to2d(attn1[4]),)
    a2 = tuple(wcast(w) for w in attn2[:-1]) + (to2d(attn2[-1]),)
    ffp = (wcast(ff[0]), to2d(ff[1]), wcast(ff[2]), to2d(ff[3]))
    return _spatial_block_call(
        x, ctx_t, ctx_i, lns_p, a1, a2, ffp,
        heads=heads, scale=float(scale), eps=float(eps),
        text_len=int(text_len), img_len=int(img_len), has_img=has_img,
        interpret=_mode() == "interpret",
    )
