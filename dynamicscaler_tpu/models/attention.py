"""Attention stack for the LVDM UNet.

TPU-native rebuild of lvdm/modules/attention.py:21-373. Differences from the
torch/xformers reference, by design:

* One fused attention primitive (`scaled_attention`) replaces both the
  einsum path and xformers `memory_efficient_attention` — XLA fuses the
  softmax chain on TPU; the interface is kept narrow so a Pallas
  flash-attention kernel can be swapped in.
* Dual text+image cross-attention (attention.py:116-124) = two attentions
  over split KV, summed with scale 1.0.
* Temporal relative-position bias (attention.py:21-40,94-113) folds into the
  logits/output as einsum terms.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.models.layers import FeedForward


from dynamicscaler_tpu.ops.attention import attention as _fused_attention


def scaled_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over [B, H, N, D]: dispatches to the Pallas TPU flash
    kernel / chunked online-softmax / fp32-einsum by shape+platform
    (see ops/attention.py)."""
    return _fused_attention(q, k, v, scale, bias=bias, mask=mask)


class CrossAttention(nn.Module):
    """Self/cross attention with optional dual image-KV and temporal
    relative-position bias (lvdm/modules/attention.py:43-127)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # None -> self attention
    img_cross_attention: bool = False
    text_context_len: int = 77
    relative_position: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        inner = h * d
        scale = d**-0.5
        B, N, _ = x.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        ctx = x if context is None else context
        use_img = self.img_cross_attention and context is not None
        if use_img:
            ctx_txt = ctx[:, : self.text_context_len]
            ctx_img = ctx[:, self.text_context_len :]
        else:
            ctx_txt = ctx

        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx_txt)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx_txt)

        def split(t):
            return t.reshape(B, t.shape[1], h, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)

        bias = None
        if self.relative_position:
            assert self.temporal_length is not None
            M = kh.shape[2]
            table_k = self.param(
                "rel_pos_k",
                nn.initializers.xavier_uniform(),
                (2 * self.temporal_length + 1, d),
            )
            table_v = self.param(
                "rel_pos_v",
                nn.initializers.xavier_uniform(),
                (2 * self.temporal_length + 1, d),
            )
            dist = jnp.arange(M)[None, :] - jnp.arange(N)[:, None]
            dist = jnp.clip(dist, -self.temporal_length, self.temporal_length)
            idx = dist + self.temporal_length
            k2 = table_k[idx].astype(self.dtype)  # [N, M, d]
            bias = jnp.einsum("bhnd,nmd->bhnm", qh, k2) * scale

        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]  # [B, 1, N, M]

        out = scaled_attention(qh, kh, vh, scale, bias=bias, mask=mask)

        if self.relative_position:
            # second-order value term: probs @ rel_v — recompute probs
            logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * scale + bias
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qh.dtype)
            v2 = table_v[idx].astype(self.dtype)
            out = out + jnp.einsum("bhnm,nmd->bhnd", probs, v2)

        if use_img:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(ctx_img)
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(ctx_img)
            out_ip = scaled_attention(qh, split(k_ip), split(v_ip), scale)
            out = out + 1.0 * out_ip  # image_cross_attention_scale = 1.0

        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF with pre-LayerNorms
    (lvdm/modules/attention.py:187-220)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    img_cross_attention: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        attn_kwargs = dict(
            heads=self.heads,
            dim_head=self.dim_head,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            dtype=self.dtype,
        )
        x = CrossAttention(name="attn1", **attn_kwargs)(ln("norm1")(x), mask=mask) + x
        x = (
            CrossAttention(
                name="attn2",
                context_dim=self.context_dim,
                img_cross_attention=self.img_cross_attention,
                **attn_kwargs,
            )(ln("norm2")(x), context=context, mask=mask)
            + x
        )
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(ln("norm3")(x)) + x
        return x
