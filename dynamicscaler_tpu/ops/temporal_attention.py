"""Pallas TPU kernel: tiny-sequence (temporal) multi-head self-attention.

VideoCrafter's temporal attention runs over N=16 frame tokens for every
(batch x h x w) position — hundreds of thousands of independent 16x16
attentions. XLA lowers these batched micro-matmuls catastrophically
(measured 139 ms for 278 GFLOPs at the level-1 shape — 1% MFU — vs a
0.5 ms HBM traffic bound; the best pure-JAX reformulation still needs
43 ms, and in-kernel dot_general / naive broadcasts fare no better).

The layout that works: put the huge ROW axis on the vector lanes. Inputs
are transposed outside to ``[F, D, RH]`` and each tile computes over a
``[F, D, T]`` block with T rows riding the 128-lane axis:

    logits[i, j, :] = sum_d q[i, d, :] * k[j, d, :]      (VPU FMAs)
    p = softmax_j(logits)                                 (lane-parallel)
    out[i, d, :]   = sum_j p[i, j, :] * v[j, d, :]        (VPU FMAs)

Every operation is an elementwise op over [.., .., T] vectors — fully
lane-parallel, zero HBM traffic between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512  # rows per grid step (lane axis)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:].astype(jnp.float32)  # [F, D, T]
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    F, D, T = q.shape

    # loop the query-frame axis (F static, small): keeps temporaries at
    # [F, D, T] (a one-shot [F, F, D, T] broadcast would blow VMEM)
    rows = []
    for i in range(F):
        # logits_i[j, t] = sum_d q[i, d, t] * k[j, d, t]
        logits = jnp.sum(q[i][None, :, :] * k, axis=1) * scale  # [F, T]
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)  # softmax over j
        # o_i[d, t] = sum_j p[j, t] * v[j, d, t]
        rows.append(jnp.sum(p[:, None, :] * v, axis=0))  # [D, T]
    o_ref[:] = jnp.stack(rows, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale_static",))
def _tiny_attention_tpu(qT, kT, vT, scale_static: float):
    """qT/kT/vT: [F, D, RH] -> out [F, D, RH]."""
    F, D, RH = qT.shape
    pad = (-RH) % _TILE
    if pad:
        qT = jnp.pad(qT, ((0, 0), (0, 0), (0, pad)))
        kT = jnp.pad(kT, ((0, 0), (0, 0), (0, pad)))
        vT = jnp.pad(vT, ((0, 0), (0, 0), (0, pad)))
    Rp = RH + pad
    spec = pl.BlockSpec((F, D, _TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale_static),
        out_shape=jax.ShapeDtypeStruct((F, D, Rp), qT.dtype),
        grid=(Rp // _TILE,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(qT, kT, vT)
    return out[:, :, :RH]


def tiny_temporal_attention(q, k, v, scale: float):
    """Self-attention over a tiny token axis.

    q/k/v: [R, F, H, D]; returns [R, F, H, D]. Pallas kernel on TPU,
    reference einsum elsewhere.
    """
    R, F, H, D = q.shape

    def fold(t):
        # [R, F, H, D] -> [F, D, R*H] (rows on lanes)
        return t.transpose(1, 3, 0, 2).reshape(F, D, R * H)

    if jax.devices()[0].platform == "tpu":
        o = _tiny_attention_tpu(fold(q), fold(k), fold(v), float(scale))
        return o.reshape(F, D, R, H).transpose(2, 0, 3, 1)
    logits = jnp.einsum("rfhd,rghd->rhfg", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, -1).astype(q.dtype)
    return jnp.einsum("rhfg,rghd->rfhd", p, v)


def tiny_attention_bhnd(q, k, v, scale: float):
    """[B, H, N, D] adapter for the dispatching attention entry point."""
    B, H, N, D = q.shape

    def fold(t):
        # [B, H, N, D] -> [N, D, B*H]
        return t.transpose(2, 3, 0, 1).reshape(N, D, B * H)

    if jax.devices()[0].platform != "tpu":
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(logits, -1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = _tiny_attention_tpu(fold(q), fold(k), fold(v), float(scale))
    return o.reshape(N, D, B, H).transpose(2, 3, 0, 1)
