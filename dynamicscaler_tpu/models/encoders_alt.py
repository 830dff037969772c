"""Alternate text encoders: HF-CLIP, T5 v1.1, and the combined pair.

Rebuilds of the reference's *unused-but-present* conditioning encoders
(lvdm/modules/encoders/condition.py): ``FrozenCLIPEmbedder`` (:89-135, the
huggingface CLIP text tower with last/pooled/hidden layer selection),
``FrozenT5Embedder`` (:57-86, T5 v1.1 encoder stack), and
``FrozenCLIPT5Encoder`` (:377-392, both in parallel returning a pair). No
shipped config instantiates them, but they are reference surface; a user
switching encoders finds the same knobs here.

Both towers take TOKEN IDS (shape [B, L]) — tokenization is an asset-
supplied host-side step exactly like the OpenCLIP BPE (utils/tokenizer.py);
the reference's ``T5Tokenizer/CLIPTokenizer.from_pretrained`` downloads are
not reproducible in a hermetic environment.

Numerics follow the transformers implementations (the oracle in
tests/test_encoders_alt.py):

* HF CLIP text: pre-LN causal transformer with QuickGELU
  (``x * sigmoid(1.702 x)``), final LayerNorm; ``pooled`` selects the
  EOT position via ``argmax(tokens)`` (CLIPTextTransformer pooling for
  vocab where EOT is the max id, e.g. openai/clip-vit-large-patch14);
  ``hidden``/``layer_idx`` returns the pre-final-LN hidden state after
  block ``layer_idx`` (condition.py:120-130 semantics).
* T5 v1.1: RMSNorm (no mean subtraction, fp32 stats), relative-position
  bucket bias computed once in block 0 and shared across layers,
  UNSCALED attention logits (T5 folds 1/sqrt(d) into init), gated
  tanh-GELU feed-forward (wi_0 ⊙ wi_1), no biases anywhere, final RMSNorm.

Weight conversion from torch checkpoints: utils/weights.convert_hf_clip_text
/ convert_t5_encoder.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class HFCLIPTextConfig:
    """transformers CLIPTextConfig subset (openai/clip-vit-large-patch14
    defaults — condition.py:98)."""

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_width: int = 3072
    context_length: int = 77
    layer: str = "last"  # last | pooled | hidden (condition.py:91-95)
    layer_idx: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class T5Config:
    """transformers T5Config subset (google/t5-v1_1-large defaults —
    condition.py:60)."""

    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class HFCLIPBlock(nn.Module):
    cfg: HFCLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d = cfg.width // cfg.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        B, N, _ = h.shape

        def heads(t):
            return t.reshape(B, N, cfg.heads, d).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(cfg.width, dtype=self.dtype, name="q")(h)) * (d**-0.5)
        k = heads(nn.Dense(cfg.width, dtype=self.dtype, name="k")(h))
        v = heads(nn.Dense(cfg.width, dtype=self.dtype, name="v")(h))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", probs, v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(cfg.width, dtype=self.dtype, name="out")(o.reshape(B, N, cfg.width))

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(cfg.mlp_width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(cfg.width, dtype=self.dtype, name="mlp_proj")(h)


class HFCLIPTextEncoder(nn.Module):
    """FrozenCLIPEmbedder equivalent (condition.py:89-135)."""

    cfg: HFCLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.layer == "hidden":
            assert cfg.layer_idx is not None and 0 <= abs(cfg.layer_idx) <= cfg.layers
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        L = tokens.shape[1]
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[:L].astype(self.dtype)

        causal = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
        # hidden_states[i] in transformers = the input of block i; index 0 is
        # the embedding output, index layers is the last pre-final-LN state
        want_hidden = None
        if cfg.layer == "hidden":
            want_hidden = cfg.layer_idx % (cfg.layers + 1)
        hidden = x
        for i in range(cfg.layers):
            if want_hidden == i:
                hidden = x
            x = HFCLIPBlock(cfg, dtype=self.dtype, name=f"block{i}")(x, causal)
        if want_hidden == cfg.layers:
            hidden = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        if cfg.layer == "last":
            return x
        if cfg.layer == "pooled":
            eot = jnp.argmax(tokens, axis=-1)  # EOT has the max vocab id
            return jnp.take_along_axis(x, eot[:, None, None], axis=1)
        return hidden


def _t5_relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucketing (transformers T5Attention._relative_position_
    bucket): half the buckets by sign, half of each linearly for small
    distances, log-spaced beyond."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def t5_position_bucket_table(L: int, cfg: T5Config) -> np.ndarray:
    """[L, L] bucket ids, host-precomputed (static per sequence length)."""
    ctx = np.arange(L)[:, None]
    mem = np.arange(L)[None, :]
    return _t5_relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )


class T5RMSNorm(nn.Module):
    dim: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * w.astype(self.dtype)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        B, L, _ = x.shape
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, name=name
        )

        h = T5RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_attn")(x)

        def heads(t):
            return t.reshape(B, L, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        # NOTE: no 1/sqrt(d_kv) — T5 folds the scale into initialization
        q = heads(dense(inner, "q")(h))
        k = heads(dense(inner, "k")(h))
        v = heads(dense(inner, "v")(h))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) + position_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", probs, v).transpose(0, 2, 1, 3)
        x = x + dense(cfg.d_model, "o")(o.reshape(B, L, inner))

        h = T5RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_ff")(x)
        gate = nn.gelu(dense(cfg.d_ff, "wi_0")(h), approximate=True)  # gelu_new
        h = gate * dense(cfg.d_ff, "wi_1")(h)
        return x + dense(cfg.d_model, "wo")(h)


class T5TextEncoder(nn.Module):
    """FrozenT5Embedder equivalent (condition.py:57-86): the encoder stack
    of ``T5EncoderModel``, returning ``last_hidden_state``."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        emb = self.param(
            "token_embedding", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model)
        )
        x = emb[tokens].astype(self.dtype)

        L = tokens.shape[1]
        buckets = jnp.asarray(t5_position_bucket_table(L, cfg))
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        # [1, heads, L, L], computed once, shared by every block (block 0
        # owns the table in the torch layout; see convert_t5_encoder)
        position_bias = bias_table[buckets].transpose(2, 0, 1)[None]

        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f"block{i}")(x, position_bias)
        return T5RMSNorm(
            cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_final"
        )(x)


class CLIPT5TextEncoder:
    """FrozenCLIPT5Encoder equivalent (condition.py:377-392): both towers on
    the same prompt, returning ``(clip_tokens_z, t5_tokens_z)``. A thin
    functional pair — each tower keeps its own params/tokenizer."""

    def __init__(self, clip_cfg: HFCLIPTextConfig = HFCLIPTextConfig(),
                 t5_cfg: T5Config = T5Config(), dtype=jnp.float32):
        self.clip = HFCLIPTextEncoder(clip_cfg, dtype=dtype)
        self.t5 = T5TextEncoder(t5_cfg, dtype=dtype)

    def __call__(self, params: dict, clip_tokens, t5_tokens) -> Tuple:
        return (
            self.clip.apply(params["clip"], clip_tokens),
            self.t5.apply(params["t5"], t5_tokens),
        )


class IdentityEncoder:
    """condition.py:18-21 — passthrough conditioning."""

    def encode(self, x):
        return x


@dataclasses.dataclass(frozen=True)
class ClassEmbedderConfig:
    embed_dim: int = 512
    n_classes: int = 1000  # +1 implicit ucg class at id n_classes-1


class ClassEmbedder(nn.Module):
    """condition.py:23-47 — class-label conditioning with unconditional-
    guidance dropout: with prob ``ucg_rate`` a label is replaced by the
    reserved last class. Keyed dropout (a PRNG key instead of torch's
    global bernoulli); ``key=None`` or ``disable_dropout`` skips it."""

    cfg: ClassEmbedderConfig
    ucg_rate: float = 0.1

    @nn.compact
    def __call__(self, labels: jnp.ndarray, key=None, disable_dropout: bool = False):
        emb = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.cfg.n_classes, self.cfg.embed_dim),
        )
        c = labels.astype(jnp.int32)
        if self.ucg_rate > 0.0 and not disable_dropout and key is not None:
            drop = jax.random.bernoulli(key, self.ucg_rate, c.shape)
            c = jnp.where(drop, self.cfg.n_classes - 1, c)
        return emb[c][:, None, :]  # [B, 1, D] crossattn token

    @staticmethod
    def unconditional_labels(cfg: ClassEmbedderConfig, batch: int) -> jnp.ndarray:
        """condition.py:44-47 get_unconditional_conditioning."""
        return jnp.full((batch,), cfg.n_classes - 1, jnp.int32)
