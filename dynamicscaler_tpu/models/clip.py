"""OpenCLIP ViT-H/14 text and vision towers in Flax.

Rebuild of the two encoders the reference configs use
(lvdm/modules/encoders/condition.py:174-235 ``FrozenOpenCLIPEmbedder``,
:298-374 ``FrozenOpenCLIPImageEmbedderV2``):

* Text: token + positional embedding, causal pre-LN transformer, stop one
  block early for ``penultimate``, then ``ln_final``; returns the full
  77-token sequence (no pooling).
* Vision: patch conv + CLS + positional embedding, ``ln_pre``, full
  transformer; returns the full 257-token sequence **without** ``ln_post``
  or the projection (condition.py:345-374 V2 semantics).

LAION-trained ViT-H uses exact (erf) GELU, not QuickGELU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.config import CLIPTextConfig, CLIPVisionConfig


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[-1, 1] NHWC images -> CLIP-normalized ``image_size``².

    The reference resizes with kornia bicubic (antialiased,
    align_corners=True, condition.py:324-332); jax.image.resize bicubic is
    antialiased with half-pixel centers — visually identical, not
    bit-identical.
    """
    B = images.shape[0]
    x = jax.image.resize(images, (B, image_size, image_size, images.shape[-1]), method="bicubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (fused qkv in_proj + out_proj)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, N, _ = x.shape
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, self.heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * (d**-0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    # OpenAI-CLIP checkpoints (ClipImageEmbedder, condition.py:136-171) use
    # QuickGELU; LAION OpenCLIP ViT-H uses exact GELU. Activation only — the
    # param tree is identical either way.
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + MHA(self.width, self.heads, dtype=self.dtype, name="attn")(ln("ln_1")(x), mask)
        h = ln("ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h) if self.quick_gelu else nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns the full token sequence after ln_final; ``penultimate`` stops
    one transformer block early (condition.py:215-231)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.width)
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb.astype(self.dtype)

        N = cfg.context_length
        causal = jnp.triu(jnp.full((N, N), jnp.finfo(jnp.float32).min), k=1)

        n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
        for i in range(n_blocks):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, dtype=self.dtype, name=f"resblock{i}"
            )(x, causal)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)


class CLIPVisionEncoder(nn.Module):
    """Returns the full [B, 257, width] token sequence (no ln_post/proj),
    matching FrozenOpenCLIPImageEmbedderV2 (condition.py:345-374).

    Input: CLIP-normalized [B, 224, 224, 3] (use :func:`clip_preprocess`).
    """

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        grid = cfg.image_size // cfg.patch_size
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        B = x.shape[0]
        x = x.reshape(B, grid * grid, cfg.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (grid * grid + 1, cfg.width)
        )
        x = x + pos.astype(self.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, dtype=self.dtype,
                quick_gelu=self.quick_gelu, name=f"resblock{i}"
            )(x)
        return x


class CLIPVisionPooled(nn.Module):
    """Pooled + projected CLIP image embedding: CLS token -> ``ln_post`` ->
    ``@ proj`` -> [B, output_dim].

    One module covers both pooled image embedders in the reference:

    * ``FrozenOpenCLIPImageEmbedder`` (condition.py:238-295): open_clip
      ``model.visual(img)`` — the ViT tower with CLS ("global") pooling,
      exact-GELU MLPs (LAION ViT-H).
    * ``ClipImageEmbedder`` (condition.py:136-171): OpenAI clip
      ``model.encode_image`` — the same computation with QuickGELU MLPs
      (``quick_gelu=True``).

    Both torch state dicts share the ``visual.*`` naming (conv1,
    class_embedding, transformer.resblocks, ln_post, proj) — converted by
    ``utils/weights.convert_clip_vision_pooled``.
    """

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = CLIPVisionEncoder(
            cfg, dtype=self.dtype, quick_gelu=self.quick_gelu, name="tower"
        )(images)
        cls = x[:, 0]
        cls = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(cls)
        proj = self.param(
            "proj", nn.initializers.normal(cfg.width**-0.5), (cfg.width, cfg.output_dim)
        )
        return cls @ proj.astype(self.dtype)


def ucg_dropout(z: jnp.ndarray, key, ucg_rate: float, no_dropout: bool = False):
    """Unconditional-guidance embedding dropout (condition.py:169-170,
    :284-285): with prob ``ucg_rate`` a batch row's embedding is zeroed.
    Keyed bernoulli instead of torch's global RNG; ``key=None`` or
    ``no_dropout`` is the reference's ``no_dropout=True`` path."""
    if ucg_rate <= 0.0 or no_dropout or key is None:
        return z
    keep = jax.random.bernoulli(key, 1.0 - ucg_rate, (z.shape[0],))
    return z * keep[:, None].astype(z.dtype)


class OpenCLIPImageEmbedderPooled:
    """``FrozenOpenCLIPImageEmbedder`` equivalent (condition.py:238-295):
    kornia-style preprocess -> pooled visual tower -> ucg dropout. Input is
    [-1, 1] NHWC (torch order only at the converter boundary)."""

    def __init__(self, cfg: CLIPVisionConfig, ucg_rate: float = 0.0,
                 dtype=jnp.float32, quick_gelu: bool = False):
        self.model = CLIPVisionPooled(cfg, dtype=dtype, quick_gelu=quick_gelu)
        self.cfg = cfg
        self.ucg_rate = ucg_rate

    def init(self, key, images):
        return self.model.init(key, clip_preprocess(images, self.cfg.image_size))

    def __call__(self, params, images, key=None, no_dropout: bool = False):
        z = self.model.apply(params, clip_preprocess(images, self.cfg.image_size))
        return ucg_dropout(z, key, self.ucg_rate, no_dropout)


class ClipImageEmbedder(OpenCLIPImageEmbedderPooled):
    """``ClipImageEmbedder`` equivalent (condition.py:136-171): OpenAI-CLIP
    ``encode_image`` (QuickGELU tower) with the same preprocess + ucg
    dropout as the pooled OpenCLIP embedder."""

    def __init__(self, cfg: CLIPVisionConfig, ucg_rate: float = 0.0, dtype=jnp.float32):
        super().__init__(cfg, ucg_rate=ucg_rate, dtype=dtype, quick_gelu=True)
