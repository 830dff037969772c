"""SD KL-VAE (2D autoencoder), Flax / NHWC.

Rebuild of lvdm/modules/networks/ae_modules.py:26-563 +
lvdm/models/autoencoder.py:13-127 semantics: encoder with asymmetric-padded
stride-2 downsampling (pad right/bottom only, ae_modules.py:102-107),
mid res-attn-res, double-z Gaussian output; decoder with nearest-x2
upsampling. GroupNorm(32, eps=1e-6) throughout, swish nonlinearity.

Video usage is per-frame ("2DAE", ddpm3d.py:485-490,556-562): frames ride the
batch axis, so encode/decode of a clip is one batched conv program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.config import VAEConfig
from dynamicscaler_tpu.models.layers import LNParams
from dynamicscaler_tpu.ops import fused_twrap


def _gn_silu(x, name, act=True):
    """GroupNorm(32, eps=1e-6) [-> swish] via folded statistics + one
    fused elementwise pass on TPU (ops/fused_twrap.gn_silu); LNParams
    holder keeps the flat {scale, bias} param path of nn.GroupNorm.
    Must be called from within an @nn.compact method."""
    s, b = LNParams(x.shape[-1], name=name)()
    return fused_twrap.gn_silu(x, s, b, eps=1e-6, act=act, site="vae")


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn_silu(x.astype(self.dtype), "norm1")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _gn_silu(h, "norm2")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over H*W (ae_modules.py:26-87)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        from dynamicscaler_tpu.ops.attention import attention as fused_attention

        h = _gn_silu(x.astype(self.dtype), "norm", act=False)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, 1, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, 1, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, 1, H * W, C)
        # single head, head_dim = C: chunked path engages at panorama widths
        out = fused_attention(q, k, v, C**-0.5)[:, 0].reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample2D(nn.Module):
    """Stride-2 conv with (0,1,0,1) asymmetric pad (ae_modules.py:102-107)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """ae_modules.py:364-463. Input [B, H, W, 3] in [-1, 1]; output
    [B, H/8, W/8, 2*z] (moments: mean||logvar)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(
                    cfg.ch * mult, dtype=self.dtype, name=f"down{i_level}_block{i_block}"
                )(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = Downsample2D(h.shape[-1], dtype=self.dtype, name=f"down{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = _gn_silu(h, "norm_out")
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """ae_modules.py:466-563. Input [B, h, w, z]; output [B, 8h, 8w, 3]."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, dtype=self.dtype, name=f"up{i_level}_block{i_block}"
                )(h)
            if i_level != 0:
                h = Upsample2D(h.shape[-1], dtype=self.dtype, name=f"up{i_level}_upsample")(h)
        h = _gn_silu(h, "norm_out")
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class DiagonalGaussianDistribution:
    """Diagonal Gaussian over NHWC moments (lvdm/distributions.py:24-65).

    The reference chunks on the channel axis (dim=1, NCHW); here moments are
    channel-last so the split is on the final axis. ``kl``/``nll`` reduce
    over all non-batch axes, matching the reference's dim=[1,2,3].
    """

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        if deterministic:
            self.std = self.var = jnp.zeros_like(mean)
        else:
            self.std = jnp.exp(0.5 * self.logvar)
            self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def _reduce_dims(self):
        return tuple(range(1, self.mean.ndim))

    def kl(self, other: "DiagonalGaussianDistribution" = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        d = self._reduce_dims()
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=d
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=d,
        )

    def nll(self, sample: jnp.ndarray, dims=None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],), self.mean.dtype)
        d = tuple(dims) if dims is not None else self._reduce_dims()
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=d,
        )


class IdentityFirstStage:
    """Pass-through first stage (lvdm/models/autoencoder.py:202-219): for
    configs that diffuse in pixel space. encode/decode are identity."""

    def encode(self, x, *a, **k):
        return x

    def decode(self, x, *a, **k):
        return x


class AutoencoderKL(nn.Module):
    """Encoder + Decoder + quant convs (lvdm/models/autoencoder.py:13-127).

    ``encode`` returns the distribution mode/sample already multiplied by the
    LDM ``scale_factor``; ``decode`` divides it back (ddpm3d.py
    get_first_stage_encoding / decode_core semantics).
    """

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, dtype=self.dtype, name="decoder")
        zc = self.cfg.z_channels
        dz = 2 if self.cfg.double_z else 1
        self.quant_conv = nn.Conv(dz * self.cfg.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(zc, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode(self, x, key: Optional[jax.Array] = None):
        """Encode to scaled latent. Deterministic (mode) unless a key is
        given (then samples the diagonal Gaussian)."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * self.cfg.scale_factor

    def decode(self, z):
        z = z / self.cfg.scale_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key: Optional[jax.Array] = None):
        z = self.encode(x, key)
        return self.decode(z)
