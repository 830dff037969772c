"""Shared Flax building blocks for the LVDM model stack.

Numerics conventions match the torch reference so converted weights
reproduce outputs: GroupNorm eps 1e-5 (1e-6 inside transformers/VAE),
LayerNorm eps 1e-5, exact (erf) GELU, sinusoidal timestep embedding with
[cos, sin] concat order (lvdm/models/utils_diffusion.py:8-28).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings; note the reference concatenates [cos, sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def zeros_init():
    return nn.initializers.zeros


class GroupNorm32(nn.Module):
    """GroupNorm(32) matching torch defaults (eps configurable)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # normalize in fp32 for stability regardless of compute dtype
        orig = x.dtype
        x = nn.GroupNorm(num_groups=32, epsilon=self.epsilon, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return x.astype(orig)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        kernel_init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=kernel_init,
            name="dense",
        )(x)


class Conv2D(nn.Module):
    """3x3/1x1 conv on [..., H, W, C] (NHWC)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        kernel_init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dtype=self.dtype,
            kernel_init=kernel_init,
            name="conv",
        )(x)


class Conv3DTemporal(nn.Module):
    """Conv3d with kernel (3, kh, kw) over [B, F, H, W, C]."""

    features: int
    spatial_kernel: int = 1
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.spatial_kernel
        pad = ((1, 1), (k // 2, k // 2), (k // 2, k // 2))
        kernel_init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features,
            kernel_size=(3, k, k),
            padding=pad,
            dtype=self.dtype,
            kernel_init=kernel_init,
            name="conv",
        )(x)


class MLPEmbed(nn.Module):
    """Dense -> SiLU -> Dense (time/fps embedding MLP)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)
        return x


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward (lvdm/modules/attention.py:386-403, glu=True)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="out")(x)
        return x
