"""Image-token projectors for i2v conditioning.

Rebuild of lvdm/modules/encoders/ip_resampler.py:7-135: ``ImageProjModel``
(linear -> N tokens) and the perceiver ``Resampler`` (16 learned queries,
depth 4) that maps the CLIP ViT-H full token sequence (257 x 1280) to 16
cross-attention tokens of width 1024.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.config import ResamplerConfig


class ImageProjModel(nn.Module):
    """Linear projection to N context tokens (ip_resampler.py:7-21)."""

    cross_attention_dim: int = 1024
    clip_embeddings_dim: int = 1024
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        x = nn.Dense(self.num_tokens * self.cross_attention_dim, dtype=self.dtype, name="proj")(
            image_embeds
        )
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class PerceiverAttention(nn.Module):
    """ip_resampler.py:45-91: latents attend over [x ; latents]."""

    dim: int
    dim_head: int = 64
    heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        B, L, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            return t.reshape(B, t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(self.dim_head, jnp.float32)))
        logits = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh * scale)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class PerceiverFF(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)


class Resampler(nn.Module):
    cfg: ResamplerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / (cfg.dim**0.5),
            (1, cfg.num_queries, cfg.dim),
        ).astype(self.dtype)
        latents = jnp.broadcast_to(latents, (x.shape[0], cfg.num_queries, cfg.dim))

        x = nn.Dense(cfg.dim, dtype=self.dtype, name="proj_in")(x)
        for d in range(cfg.depth):
            latents = (
                PerceiverAttention(
                    cfg.dim, cfg.dim_head, cfg.heads, dtype=self.dtype, name=f"attn{d}"
                )(x, latents)
                + latents
            )
            latents = PerceiverFF(cfg.dim, cfg.ff_mult, dtype=self.dtype, name=f"ff{d}")(latents) + latents
        latents = nn.Dense(cfg.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(latents)
