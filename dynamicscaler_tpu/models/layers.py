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


class LNParams(nn.Module):
    """Parameter twin of nn.LayerNorm: declares {scale, bias} under this
    module's scope and returns the raw arrays (for fused kernels)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class GNParams(nn.Module):
    """Parameter twin of GroupNorm32: declares the nested
    GroupNorm_0/{scale, bias} and returns the raw arrays (for fused
    kernels). Param paths stay bit-identical to GroupNorm32."""

    dim: int

    @nn.compact
    def __call__(self):
        return LNParams(self.dim, name="GroupNorm_0")()


class ProjParams(nn.Module):
    """Parameter twin of nn.Dense: declares {kernel[, bias]} under this
    module's scope and returns the raw arrays (for fused kernels)."""

    in_dim: int
    out_dim: int
    use_bias: bool = False
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_dim,))
            if self.use_bias
            else None
        )
        return k, b


def layer_norm(x, scale, bias, eps: float = 1e-5, dtype=None):
    """flax nn.LayerNorm numerics: fp32 fast-variance stats, clamped var,
    y = (x - mu) * (rsqrt(var + eps) * scale) + bias, cast to dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    y = (xf - mu) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return y.astype(dtype if dtype is not None else x.dtype)


class _GEGLUParams(nn.Module):
    """Scope twin of the old GEGLU submodule (param path geglu/proj/*)."""

    in_dim: int
    out2: int

    @nn.compact
    def __call__(self):
        return ProjParams(self.in_dim, self.out2, use_bias=True, name="proj")()


class FeedForward(nn.Module):
    """GEGLU feed-forward (lvdm/modules/attention.py:386-403, glu=True).

    When ``ln`` (scale, bias) is passed, the pre-FF LayerNorm applies here
    and, on TPU at C <= 640, the whole LN -> GEGLU -> out [-> +x] sub-block
    runs as one Pallas kernel (ops/fused_temporal.fused_ln_geglu). Params are
    declared via holder twins so the tree stays bit-identical to nn.Dense."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None, add_residual: bool = False,
                 params_only: bool = False):
        from dynamicscaler_tpu.ops import fused_temporal

        inner = int(self.dim * self.mult)
        w1, b1 = _GEGLUParams(self.dim, inner * 2, name="geglu")()
        w2, b2 = ProjParams(inner, self.dim, use_bias=True, name="out")()
        if params_only:
            # raw arrays for a caller-side fused block kernel
            return (w1, b1, w2, b2)

        if ln is not None and x.shape[-1] == self.dim and fused_temporal.ff_fusable(self.dim):
            return fused_temporal.fused_ln_geglu(
                x, ln[0], ln[1], w1, b1, w2, b2, add_residual=add_residual
            )

        x_res = x
        h = layer_norm(x, ln[0], ln[1], dtype=self.dtype) if ln is not None else x
        dt = self.dtype
        a = jnp.dot(h.astype(dt), w1.astype(dt)) + b1.astype(dt)
        val, gate = jnp.split(a, 2, axis=-1)
        h = val * nn.gelu(gate, approximate=False)
        out = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
        if add_residual:
            out = out + x_res
        return out
