"""Auxiliary ae_modules classes — dead code upstream, rebuilt for surface
completeness.

Rebuilds of every remaining class in
``lvdm/modules/networks/ae_modules.py`` that no shipped config
instantiates (the live ``Encoder``/``Decoder``/``AutoencoderKL`` path is
``models/vae.py``):

* ``Model`` (ae_modules.py:212-361) — the original DDPM 2D UNet with
  timestep embedding, skip connections and per-resolution attention.
* ``SimpleDecoder`` (:581-614), ``UpsampleDecoder`` (:617-662) — small
  alternative decoders.
* ``LatentRescaler`` (:665-699) — res/attn/res around a nearest-neighbor
  rescale (torch ``F.interpolate`` floor-index semantics reproduced with
  host-precomputed gathers).
* ``MergedRescaleEncoder`` (:702-718), ``MergedRescaleDecoder``
  (:721-735), ``Upsampler`` (:738-754) — compositions of the live
  Encoder/Decoder with a ``LatentRescaler``.
* ``Resize`` (:757-777) — fixed-mode interpolation wrapper (the learned
  branch raises NotImplementedError upstream too).
* ``LinAttnBlock`` (:20-23, ``lvdm/modules/attention.py:406-422``
  ``LinearAttention`` with heads=1, dim_head=C) — the ``make_attn``
  ``attn_type='linear'`` branch.
* ``FirstStagePostProcessor`` (:780-845) — projection + res/downsample
  stack over a frozen first-stage latent (the pretrained encode itself is
  the caller's job here: pass ``z_fs``, i.e. the mode of the first-stage
  posterior, keeping the module a pure function). NOTE: the reference
  forward is broken as shipped — ae_modules.py:828 references
  ``DiagonalGaussianDistribution`` without importing it (NameError on any
  call; nothing upstream instantiates the class) — the oracle test patches
  the name in (tests/test_vae_aux.py).

All inference-only (dropout elided), NHWC, plain XLA (no Pallas — these
are never on the hot path). Converters: ``utils/weights.convert_aux_*``.
Parity: ``tests/test_vae_aux.py`` against the imported reference classes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.config import VAEConfig
from dynamicscaler_tpu.models.vae import AttnBlock, Decoder, Downsample2D, Encoder, Upsample2D


def ddpm_timestep_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """ae_modules.py:129-150 (fairseq variant): sin-first concat and a
    ``half_dim - 1`` divisor — NOT the same as the UNet3D embedding
    (models/layers.timestep_embedding: cos-first, ``half`` divisor)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    out = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def torch_nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` on NHWC: src index =
    floor(dst * in / out) per axis — asymmetric, not half-pixel. Exact
    parity for any (non-)integer factor via two static gathers."""
    H, W = x.shape[1], x.shape[2]
    hi = np.arange(out_h) * H // out_h
    wi = np.arange(out_w) * W // out_w
    return x[:, hi][:, :, wi]


class ResnetBlockT(nn.Module):
    """ae_modules.py:151-209 with the timestep-embedding projection the
    live VAE path never uses (temb_channels>0 → ``temb_proj`` after
    conv1). ``temb=None`` reproduces models/vae.ResnetBlock numerics."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_ch = x.shape[-1]
        gn = lambda name: nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name=name)
        h = nn.silu(gn("norm1")(x.astype(self.dtype)))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            h = h + nn.Dense(self.out_channels, dtype=self.dtype, name="temb_proj")(
                nn.silu(temb)
            )[:, None, None, :]
        h = nn.silu(gn("norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class LinAttnBlock(nn.Module):
    """attention.py:406-422 LinearAttention at heads=1, dim_head=C
    (ae_modules.py:20-23): softmax over the KEY token axis, then the
    k·vᵀ / context·q linear-attention contraction."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        qkv = nn.Conv(3 * C, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * C), 3, axis=-1)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(q.dtype)  # over tokens
        context = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bde,bnd->bne", context, q).reshape(B, H, W, C)
        return nn.Conv(C, (1, 1), dtype=self.dtype, name="to_out")(out)


@dataclasses.dataclass(frozen=True)
class AuxModelConfig:
    """ae_modules.py:212-234 constructor surface (dropout elided —
    inference only; ``use_linear_attn`` folds into ``attn_type``)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    use_timestep: bool = True
    attn_type: str = "vanilla"  # vanilla | linear | none


def _make_attn(attn_type: str, dtype, name: str):
    """ae_modules.py:80-87 make_attn."""
    if attn_type == "vanilla":
        return AttnBlock(dtype=dtype, name=name)
    if attn_type == "linear":
        return LinAttnBlock(dtype=dtype, name=name)
    return lambda x: x  # "none"


class Model(nn.Module):
    """The original DDPM 2D UNet (ae_modules.py:212-361): timestep MLP,
    down/mid/up stacks with skip-concat, attention where the running
    resolution is in ``attn_resolutions``, optional channel-concat
    ``context`` (:314-316)."""

    cfg: AuxModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None, context=None):
        cfg = self.cfg
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        temb = None
        if cfg.use_timestep:
            assert t is not None
            temb = ddpm_timestep_embedding(t, cfg.ch)
            temb = nn.Dense(4 * cfg.ch, dtype=self.dtype, name="temb_dense0")(temb)
            temb = nn.Dense(4 * cfg.ch, dtype=self.dtype, name="temb_dense1")(nn.silu(temb))

        n_levels = len(cfg.ch_mult)
        curr_res = cfg.resolution
        hs = [nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)]
        for i in range(n_levels):
            for b in range(cfg.num_res_blocks):
                h = ResnetBlockT(
                    cfg.ch * cfg.ch_mult[i], dtype=self.dtype, name=f"down{i}_block{b}"
                )(hs[-1], temb)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg.attn_type, self.dtype, f"down{i}_attn{b}")(h)
                hs.append(h)
            if i != n_levels - 1:
                hs.append(
                    Downsample2D(hs[-1].shape[-1], dtype=self.dtype, name=f"down{i}_downsample")(hs[-1])
                )
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlockT(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h, temb)
        h = _make_attn(cfg.attn_type, self.dtype, "mid_attn_1")(h)
        h = ResnetBlockT(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h, temb)

        for i in reversed(range(n_levels)):
            for b in range(cfg.num_res_blocks + 1):
                h = ResnetBlockT(
                    cfg.ch * cfg.ch_mult[i], dtype=self.dtype, name=f"up{i}_block{b}"
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg.attn_type, self.dtype, f"up{i}_attn{b}")(h)
            if i != 0:
                h = Upsample2D(h.shape[-1], dtype=self.dtype, name=f"up{i}_upsample")(h)
                curr_res *= 2

        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h))
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class SimpleDecoder(nn.Module):
    """ae_modules.py:581-614: 1x1 conv → res(in→2in) → res(→4in) →
    res(→2in) → 1x1 conv → x2 upsample → GN/swish/conv_out."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Conv(C, (1, 1), dtype=self.dtype, name="conv0")(x)
        x = ResnetBlockT(2 * C, dtype=self.dtype, name="res1")(x)
        x = ResnetBlockT(4 * C, dtype=self.dtype, name="res2")(x)
        x = ResnetBlockT(2 * C, dtype=self.dtype, name="res3")(x)
        x = nn.Conv(C, (1, 1), dtype=self.dtype, name="conv4")(x)
        x = Upsample2D(C, dtype=self.dtype, name="upsample")(x)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(x))
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class UpsampleDecoder(nn.Module):
    """ae_modules.py:617-662: per-level (num_res_blocks+1) resblocks with
    x2 upsampling between levels, then GN/swish/conv_out."""

    out_channels: int
    ch: int
    num_res_blocks: int
    ch_mult: Tuple[int, ...] = (2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i, mult in enumerate(self.ch_mult):
            for b in range(self.num_res_blocks + 1):
                h = ResnetBlockT(self.ch * mult, dtype=self.dtype, name=f"res{i}_{b}")(h)
            if i != len(self.ch_mult) - 1:
                h = Upsample2D(h.shape[-1], dtype=self.dtype, name=f"upsample{i}")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class LatentRescaler(nn.Module):
    """ae_modules.py:665-699: conv_in → depth resblocks → nearest rescale
    by ``factor`` → AttnBlock → depth resblocks → 1x1 conv_out."""

    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i in range(self.depth):
            x = ResnetBlockT(self.mid_channels, dtype=self.dtype, name=f"res1_{i}")(x)
        out_h = int(round(x.shape[1] * self.factor))
        out_w = int(round(x.shape[2] * self.factor))
        x = torch_nearest_resize(x, out_h, out_w)
        x = AttnBlock(dtype=self.dtype, name="attn")(x)
        for i in range(self.depth):
            x = ResnetBlockT(self.mid_channels, dtype=self.dtype, name=f"res2_{i}")(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_out")(x)


class MergedRescaleEncoder(nn.Module):
    """ae_modules.py:702-718: live Encoder (double_z=False, z=ch*mult[-1])
    followed by a LatentRescaler to ``out_ch``."""

    cfg: VAEConfig  # describes the encoder half
    out_ch: int
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = self.cfg.ch * self.cfg.ch_mult[-1]
        enc_cfg = dataclasses.replace(self.cfg, z_channels=inter, double_z=False)
        h = Encoder(enc_cfg, dtype=self.dtype, name="encoder")(x)
        return LatentRescaler(
            self.rescale_factor, inter, self.out_ch,
            depth=self.rescale_module_depth, dtype=self.dtype, name="rescaler",
        )(h)


class MergedRescaleDecoder(nn.Module):
    """ae_modules.py:721-735: LatentRescaler from ``z_channels`` up to
    ``z*mult[-1]``, then the live Decoder."""

    cfg: VAEConfig  # z_channels = the INPUT latent channels (reference arg)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        tmp = self.cfg.z_channels * self.cfg.ch_mult[-1]
        h = LatentRescaler(
            self.rescale_factor, tmp, tmp,
            depth=self.rescale_module_depth, dtype=self.dtype, name="rescaler",
        )(z)
        dec_cfg = dataclasses.replace(self.cfg, z_channels=tmp)
        return Decoder(dec_cfg, dtype=self.dtype, name="decoder")(h)


class Upsampler(nn.Module):
    """ae_modules.py:738-754: LatentRescaler (factor 1 + out%in) then a
    Decoder with log2(out/in)+1 levels of uniform ch_mult."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.out_size >= self.in_size
        num_blocks = int(np.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        h = LatentRescaler(
            factor_up, 2 * self.in_channels, self.in_channels,
            depth=2, dtype=self.dtype, name="rescaler",
        )(x)
        dec_cfg = VAEConfig(
            z_channels=self.in_channels, ch=self.in_channels,
            ch_mult=tuple(self.ch_mult for _ in range(num_blocks)),
            num_res_blocks=2, out_ch=self.out_channels,
        )
        return Decoder(dec_cfg, dtype=self.dtype, name="decoder")(h)


def resize_2d(x: jnp.ndarray, scale_factor: float, mode: str = "bilinear",
              learned: bool = False) -> jnp.ndarray:
    """ae_modules.py:757-777 ``Resize``: fixed-mode interpolation of NHWC
    by ``scale_factor``; the learned branch raises upstream too (:764)."""
    if learned:
        raise NotImplementedError("learned resize is unimplemented upstream (ae_modules.py:764)")
    if scale_factor == 1.0:
        return x
    B, H, W, C = x.shape
    out = (int(round(H * scale_factor)), int(round(W * scale_factor)))
    if mode == "nearest":
        return torch_nearest_resize(x, *out)
    # torch align_corners=False bilinear == jax 'linear' half-pixel resize
    return jax.image.resize(x, (B, out[0], out[1], C), method="linear")


class FirstStagePostProcessor(nn.Module):
    """ae_modules.py:780-845 minus the frozen first-stage encode: the
    caller passes ``z_fs`` (the posterior mode of the pretrained
    AutoencoderKL — ddpm3d's ``encode_first_stage`` output), keeping this a
    pure function. proj_norm uses ``num_groups=in_channels//2`` (:801);
    downsampling is the conv-less avg-pool Downsample (:811, :90-108)."""

    ch_mult: Tuple[int, ...]
    n_channels: int
    do_reshape: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_fs):
        C = z_fs.shape[-1]
        z = nn.GroupNorm(C // 2, epsilon=1e-6, dtype=self.dtype, name="proj_norm")(z_fs)
        z = nn.Conv(self.n_channels, (3, 3), padding=1, dtype=self.dtype, name="proj")(z)
        z = nn.silu(z)
        for i, m in enumerate(self.ch_mult):
            z = ResnetBlockT(m * self.n_channels, dtype=self.dtype, name=f"block{i}")(z)
            # Downsample(with_conv=False) is 2x2/stride-2 avg-pool (:104-107)
            z = nn.avg_pool(z, (2, 2), strides=(2, 2))
        if self.do_reshape:
            B, H, W, D = z.shape
            z = z.reshape(B, H * W, D)
        return z
