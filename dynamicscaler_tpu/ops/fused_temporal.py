"""Fused Pallas TPU kernel for the UNet's temporal attention sub-blocks.

VideoCrafter's temporal transformers (lvdm/modules/attention.py:281-373)
attend over N=16 frame tokens for every (batch, h, w) position. XLA runs
the sub-block — LayerNorm -> QKV projections -> 16-token attention ->
out-projection -> residual — at ~53 TFLOP/s: the projections round-trip
the [rows, F, C] activation through HBM four times and the 16x16
attention einsums underutilize the MXU.

This kernel fuses the entire sub-block, row-tiled over rows = B*H*W,
consuming the temporal transformer's native [rows, F, C] layout directly
(the round-1 lane-major kernel won in isolation but lost to the
[B,H,N,D] relayout it required; see BENCH_NOTES.md).

The tiny-attention trick: group G = 128 // F consecutive rows so that
G*F = 128 tokens form one MXU-shaped block. Per head,

    logits = Q_g @ K_g^T            # [128, 128] — one MXU op
    logits += block_diag_mask       # kill cross-row pairs
    out    = softmax(logits) @ V_g  # [128, d]   — one MXU op

computes G independent F-token attentions per matmul pair. The masked
rows cost G x the minimal attention FLOPs, but attention is ~1% of the
sub-block FLOPs — the projections dominate and run as honest
[TR*F, C] @ [C, C] MXU matmuls on data already in VMEM.

Numerics match the unfused path (flax LayerNorm fast-variance in fp32,
bf16 matmul inputs, fp32 softmax) to bf16 rounding; parity is tested in
interpret mode on CPU (tests/test_fused_temporal.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MODE = os.environ.get("DSCALER_FUSED_TEMPORAL", "auto")  # auto | off | interpret

# per-kernel-class kill switch for ablation: comma list out of
# {temporal, spatial, cross, ff, block, wrap, gnsilu, mega, mega_t,
# mega_s}; e.g. DSCALER_FUSE_DISABLE=cross,ff. mega_t/mega_s disable just
# the temporal/spatial whole-transformer kernels (dispatch drops to
# wrap+block for that side only).
_DISABLED = frozenset(
    k for k in os.environ.get("DSCALER_FUSE_DISABLE", "").split(",") if k
)


def set_mode(mode: str) -> None:
    """auto: Pallas kernel on TPU; off: never; interpret: kernel in
    interpreter mode on any backend (for tests)."""
    global _MODE
    assert mode in ("auto", "off", "interpret"), mode
    _MODE = mode


def mode() -> str:
    return _MODE


def kernel_disabled(kind: str) -> bool:
    return kind in _DISABLED


# ---------------------------------------------------------------------------
# Per-shape dispatch plan (VERDICT r3 #2): which fusion-ladder level to run
# at each (side, channel) transformer shape, from the measured TPU v5e table
# (dev/bench_block.py xfmr slopes, B=8, 2026-08-19; BENCH_NOTES round-4):
#
#   temporal C=320 : wrap+blk 16.36 ms  (mega 17.77, wrap+sub 16.58, subs 21.57)
#   temporal C=640 : wrap+sub 10.13 ms  (mega 11.49, wrap+blk 12.10, subs 11.09)
#   temporal C=1280: wrap+sub  9.31 ms  (subs 9.68, wrap+blk 10.39, xla 13.65)
#   spatial  C=320 : mega 29.58/29.76 ms (subs 30.48/30.44, wrap+sub 33.6+ —
#                                         wrap LOSES on the spatial side)
#   spatial  C=640 : subs 12.85/12.69 ms (mega 13.08/13.06 in two runs;
#                                         wrap+sub 14.17/16.13)
#   spatial  C=1280: subs 11.72 ms      (wrap+sub 11.87, wrap+blk 11.92,
#                                        xla 12.62; block/mega illegal >640)
#
# Levels (highest first): mega > wrap+blk > wrap+sub > subs. A level names
# the PREFERRED kernel set; legality gates and DSCALER_FUSE_DISABLE kill
# switches still veto on top, falling through to the next legal level.
# Override: DSCALER_FUSE_PLAN="off" ignores the table (highest legal level
# wins — what dev/bench_block.py uses to sweep the ladder), or a comma spec
# like "t640=mega,s320=subs" patches individual entries.
# ---------------------------------------------------------------------------

_PLAN_DEFAULT = {
    ("t", 320): "wrap+blk",
    ("t", 640): "wrap+sub",
    ("t", 1280): "wrap+sub",
    ("s", 320): "mega",
    ("s", 640): "subs",
    ("s", 1280): "subs",  # spatial wrap loses at 320/640; no block/mega legal
}

_LEVEL_ALLOWS = {
    "mega": frozenset({"mega", "block", "wrap"}),
    "wrap+blk": frozenset({"block", "wrap"}),
    "wrap+sub": frozenset({"wrap"}),
    "subs": frozenset(),
}


def _parse_plan(spec: str):
    if spec in ("auto", ""):
        return dict(_PLAN_DEFAULT)
    if spec == "off":
        return None
    plan = dict(_PLAN_DEFAULT)
    for item in spec.split(","):
        k, _, lvl = item.partition("=")
        assert lvl in _LEVEL_ALLOWS, f"bad plan level {lvl!r} in {spec!r}"
        side, c = k[0], int(k[1:])
        assert side in ("t", "s"), f"bad plan key {k!r} in {spec!r}"
        plan[(side, c)] = lvl
    return plan


_PLAN = _parse_plan(os.environ.get("DSCALER_FUSE_PLAN", "auto"))


def set_plan(spec: str) -> None:
    """\"auto\" (measured table), \"off\" (highest legal level — ladder
    sweeps), or a comma spec of side+C=level overrides."""
    global _PLAN
    _PLAN = _parse_plan(spec)


def plan_allows(kind: str, side: str, C: int) -> bool:
    """Does the per-shape plan allow kernel class ``kind`` (mega/block/wrap)
    for the ``side`` ('t'/'s') transformer at channel count ``C``? Unknown
    shapes default to allowed (highest legal level, matching pre-plan
    behavior)."""
    if _PLAN is None:
        return True
    level = _PLAN.get((side, C))
    if level is None:
        return True
    return kind in _LEVEL_ALLOWS[level]


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def fusable(n_tokens: int, inner: int, query_dim: int, heads: int) -> bool:
    """Shape gate for the fused sub-block kernel.

    Requires: token count divides the 128-lane MXU block; square
    projections (inner == query dim, true for all temporal blocks);
    C <= 1280 so the four weight matrices + tiles fit VMEM (~21.5 MB at
    C=1280/TR=32; measured 7.3 -> 3.6 ms vs XLA at the L3 shape).
    """
    if _MODE == "off" or kernel_disabled("temporal"):
        return False
    if not (_MODE == "interpret" or _tpu_available()):
        return False
    return (
        n_tokens >= 2
        and 128 % n_tokens == 0
        and inner == query_dim
        and inner % heads == 0
        and inner <= 1280
        and (inner // heads) % 8 == 0
    )


def _kernel(x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, scale: float, eps: float, add_residual: bool):
    TR, F, C = x_ref.shape
    T = TR * F
    d = C // heads
    x = x_ref[:].reshape(T, C)

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

    # Block-diagonal 128-token attention: G = 128 // F rows per block
    nG = T // 128
    ti = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // F
    tj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // F
    neg = jnp.where(ti == tj, 0.0, -1e30).astype(jnp.float32)

    outs = []
    for hh in range(heads):
        qh = q[:, hh * d:(hh + 1) * d].reshape(nG, 128, d)
        kh = k[:, hh * d:(hh + 1) * d].reshape(nG, 128, d)
        vh = v[:, hh * d:(hh + 1) * d].reshape(nG, 128, d)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + neg[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        oh = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(oh.astype(x.dtype).reshape(T, d))
    o = jnp.concatenate(outs, axis=-1)

    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out.astype(x.dtype)
    if add_residual:
        out = out + x
    o_ref[:] = out.reshape(TR, F, C)


def _row_tile(F: int, C: int, itemsize: int) -> int:
    # keep TR*F*C tiles + 4 weight mats + fp32 transients under VMEM
    if C <= 320:
        tr = 128
    elif C <= 640:
        tr = 64
    else:
        tr = 32
    if itemsize > 2:  # fp32 activations double the tile footprint
        tr = max(tr // 2, 8)
    return tr


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "eps", "add_residual", "interpret"),
)
def _fused_call(x, s, b, wq, wk, wv, wo, bo, *, heads, scale, eps,
                add_residual, interpret):
    R, F, C = x.shape
    TR = _row_tile(F, C, x.dtype.itemsize)
    while (TR * F) % 128:
        TR *= 2
    pad = (-R) % TR
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Rp = R + pad

    x_spec = pl.BlockSpec((TR, F, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    flops_mm = 8 * Rp * F * C * C  # 4 projections, 2*T*C*C each
    flops_attn = 2 * 2 * Rp * F * 128 * C  # masked 128-block logits+PV
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, scale=scale, eps=eps, add_residual=add_residual
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, F, C), x.dtype),
        grid=(Rp // TR,),
        in_specs=[x_spec, vec_spec, vec_spec, w_spec, w_spec, w_spec, w_spec, vec_spec],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + flops_attn,
            bytes_accessed=2 * Rp * F * C * 2 + 4 * C * C * 2,
            transcendentals=Rp * F * 128,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, s, b, wq, wk, wv, wo, bo)
    return out[:R] if pad else out


def _erf(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 —
    below bf16 resolution). Mosaic has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ff_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, eps: float, add_residual: bool):
    TT, C = x_ref.shape
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * s_ref[:].astype(jnp.float32)
    h = ((xf - mu) * mul + b_ref[:].astype(jnp.float32)).astype(x.dtype)

    a = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    a = (a + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
    half = a.shape[-1] // 2
    val, gate = a[:, :half], a[:, half:]
    gf = gate.astype(jnp.float32)
    gelu = gf * 0.5 * (1.0 + _erf(gf * (1.0 / np.sqrt(2.0))))
    inner = (val.astype(jnp.float32) * gelu).astype(x.dtype)

    out = jnp.dot(inner, w2_ref[:], preferred_element_type=jnp.float32)
    out = (out + b2_ref[:].astype(jnp.float32)).astype(x.dtype)
    if add_residual:
        out = out + x
    o_ref[:] = out


def _ff_token_tile(C: int, itemsize: int) -> int:
    # C=1280: w1+w2 weights alone are 39MB bf16 in VMEM; keep the token
    # tile's fp32 [TT, 8C] GEGLU intermediate bounded
    tt = 512 if C <= 320 else (256 if C <= 640 else 128)
    if itemsize > 2:
        tt //= 2
    return tt


@functools.partial(jax.jit, static_argnames=("eps", "add_residual", "interpret"))
def _fused_ff_call(x2d, s, b, w1, b1, w2, b2, *, eps, add_residual, interpret):
    T, C = x2d.shape
    TT = _ff_token_tile(C, x2d.dtype.itemsize)
    pad = (-T) % TT
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    Tp = T + pad
    H2 = w1.shape[1]

    x_spec = pl.BlockSpec((TT, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps, add_residual=add_residual),
        out_shape=jax.ShapeDtypeStruct((Tp, C), x2d.dtype),
        grid=(Tp // TT,),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=x_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * C * H2 + Tp * H2 // 2 * C * 2,
            bytes_accessed=2 * Tp * C * x2d.dtype.itemsize + (C * H2 + H2 // 2 * C) * 2,
            transcendentals=Tp * H2 // 2,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2d, s, b, w1, b1, w2, b2)
    return out[:T] if pad else out


def ff_fusable(dim: int) -> bool:
    if _MODE == "off" or kernel_disabled("ff"):
        return False
    if not (_MODE == "interpret" or _tpu_available()):
        return False
    return 128 <= dim <= 1280 and dim % 64 == 0


def fused_ln_geglu(
    x: jnp.ndarray,  # [..., C]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,  # [C, 8C] GEGLU proj (value ; gate)
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [4C, C]
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    add_residual: bool = True,
) -> jnp.ndarray:
    """LayerNorm -> GEGLU feed-forward [-> +x] as one Pallas kernel
    (the transformer blocks' ff sub-block, lvdm/modules/attention.py:386-403
    with pre-LN). Token-tiled over the flattened leading axes — applies to
    spatial and temporal transformer blocks alike."""
    C = x.shape[-1]
    x2d = x.reshape(-1, C)
    to2d = lambda t: t.reshape(1, -1)
    out = _fused_ff_call(
        x2d,
        to2d(ln_scale.astype(jnp.float32)),
        to2d(ln_bias.astype(jnp.float32)),
        w1.astype(x.dtype),
        to2d(b1.astype(jnp.float32)),
        w2.astype(x.dtype),
        to2d(b2.astype(jnp.float32)),
        eps=float(eps),
        add_residual=add_residual,
        interpret=_MODE == "interpret",
    )
    return out.reshape(x.shape)


def fused_ln_attention(
    x: jnp.ndarray,
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
    """LayerNorm -> QKV -> F-token self-attention -> out-proj [-> +x].

    x: [rows, F, C]; weight matrices [C, C] (flax Dense layout, in x out);
    ln_scale/ln_bias/bo: [C]. Returns [rows, F, C] in x.dtype. Caller must
    have checked `fusable(F, C, C, heads)`.
    """
    R, F, C = x.shape
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
        interpret=_MODE == "interpret",
    )
