"""VideoCrafter 3D UNet, rebuilt in Flax for TPU.

Semantics match lvdm/modules/networks/openaimodel3d.py:312-708 (VideoCrafter2
config: model_channels 320, mult 1/2/4/4, 2 res blocks, attn at ds 1/2/4,
head dim 64, context 1024, temporal_length 16, addition_attention, fps cond,
temporal conv) with a TPU-native data layout:

* Latents are ``[B, F, H, W, C]`` (channels-last NHWC convs -> MXU tiling).
* Spatial layers run on ``[(B F), H, W, C]``; temporal layers reshape to
  ``[(B H W), F, C]`` — pure reshapes/transposes, no data-dependent control
  flow, one fixed trace per window shape.
* The window batch rides the leading axis: denoising N windows per step is a
  single forward with batch ``2N`` (cond+uncond CFG packed together).

The block layout is enumerated by :func:`unet_layout` which the torch->JAX
weight converter walks in lockstep with the reference state_dict ordering.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.config import UNetConfig
from dynamicscaler_tpu.models.layers import (
    GNParams,
    MLPEmbed,
    ProjParams,
    timestep_embedding,
)
from dynamicscaler_tpu.models.attention import BasicTransformerBlock
from dynamicscaler_tpu.ops import freetraj as freetraj_ops
from dynamicscaler_tpu.ops import fused_mega, fused_twrap


# ---------------------------------------------------------------------------
# Layout enumeration (shared with the weight converter)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One sub-layer of an encoder/decoder block.

    ``torch_path`` is the matching prefix inside the reference state_dict
    (under ``model.diffusion_model.``) so conversion is mechanical.
    """

    name: str  # flax module name
    kind: str  # res | spatial | temporal | down | up | conv_in
    channels: int
    torch_path: str
    extra: dict = dataclasses.field(default_factory=dict)


def unet_layout(cfg: UNetConfig) -> Tuple[List[List[BlockSpec]], List[List[BlockSpec]], List[BlockSpec], List[int]]:
    """Enumerate (input_blocks, output_blocks, middle_block, skip_channels)
    exactly as openaimodel3d.py:418-649 constructs them."""
    ch = cfg.model_channels
    ds = 1
    input_blocks: List[List[BlockSpec]] = [
        [BlockSpec("in0_conv", "conv_in", ch, "input_blocks.0.0")]
    ]
    input_chans = [ch]
    for level, mult in enumerate(cfg.channel_mult):
        for nr in range(cfg.num_res_blocks):
            i = len(input_blocks)
            specs = [
                BlockSpec(
                    f"in{i}_res", "res", mult * cfg.model_channels,
                    f"input_blocks.{i}.0", {"in_ch": ch},
                )
            ]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                specs.append(
                    BlockSpec(f"in{i}_spatial", "spatial", ch, f"input_blocks.{i}.1")
                )
                if cfg.temporal_attention:
                    specs.append(
                        BlockSpec(f"in{i}_temporal", "temporal", ch, f"input_blocks.{i}.2")
                    )
            input_blocks.append(specs)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            i = len(input_blocks)
            input_blocks.append(
                [BlockSpec(f"in{i}_down", "down", ch, f"input_blocks.{i}.0")]
            )
            input_chans.append(ch)
            ds *= 2

    middle = [
        BlockSpec("mid_res0", "res", ch, "middle_block.0", {"in_ch": ch}),
        BlockSpec("mid_spatial", "spatial", ch, "middle_block.1"),
    ]
    mid_idx = 2
    if cfg.temporal_attention:
        middle.append(BlockSpec("mid_temporal", "temporal", ch, "middle_block.2"))
        mid_idx = 3
    middle.append(BlockSpec("mid_res1", "res", ch, f"middle_block.{mid_idx}", {"in_ch": ch}))

    output_blocks: List[List[BlockSpec]] = []
    skip_chans: List[int] = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            skip_chans.append(ich)
            oi = len(output_blocks)
            specs = [
                BlockSpec(
                    f"out{oi}_res", "res", cfg.model_channels * mult,
                    f"output_blocks.{oi}.0", {"in_ch": ch + ich},
                )
            ]
            ch = cfg.model_channels * mult
            j = 1
            if ds in cfg.attention_resolutions:
                specs.append(
                    BlockSpec(f"out{oi}_spatial", "spatial", ch, f"output_blocks.{oi}.{j}")
                )
                j += 1
                if cfg.temporal_attention:
                    specs.append(
                        BlockSpec(f"out{oi}_temporal", "temporal", ch, f"output_blocks.{oi}.{j}")
                    )
                    j += 1
            if level and i == cfg.num_res_blocks:
                specs.append(
                    BlockSpec(f"out{oi}_up", "up", ch, f"output_blocks.{oi}.{j}")
                )
                ds //= 2
            output_blocks.append(specs)
    return input_blocks, output_blocks, middle, skip_chans


# ---------------------------------------------------------------------------
# FreeTraj per-level mask factors (ops/freetraj.py). Built lazily at each
# attention level from the [F, 4] box path — O(B*N) arrays; the rank-1
# [N, N] re-weighting is composed inside the attention logits
# (models/attention.py:_traj_attention) so it fuses and never hits HBM.
# ---------------------------------------------------------------------------


def freetraj_spatial(traj, shape, num_frames: int):
    """Per-call dict for a SpatialTransformer at latent shape [(B F),H,W,C]:
    {"self": {fg, active} | None, "cross": {fg, active, fg_tok, wadd} | None}
    (reference attention_freetraj.py:319-389; gated per frame by
    ``traj.active``)."""
    if traj is None or not (traj.self_attn or traj.cross_attn):
        return None
    BF, H, W, _ = shape
    F = num_frames
    B = BF // F
    fgm = freetraj_ops.fg_map(traj.paths, H, W).reshape(F, H * W)
    fg = jnp.tile(fgm, (B, 1))  # [(B F), N]
    active = traj.active.reshape(BF)
    d = {"self": None, "cross": None}
    if traj.self_attn:
        d["self"] = {"fg": fg, "active": active}
    if traj.cross_attn:
        wadd = freetraj_ops.cross_weight_map(
            traj.paths, H, W, traj.fg_tok.sum()
        ).reshape(F, H * W)
        d["cross"] = {
            "fg": fg,
            "active": active,
            "fg_tok": traj.fg_tok,
            "wadd": jnp.tile(wadd, (B, 1)),
        }
    return d


def freetraj_temporal(traj, shape, num_frames: int):
    """Per-call dict for a TemporalTransformer (tokens = frames, batch =
    (B H W) row-major, ops/fused_twrap.py:311-329): fg indicator says
    whether the box covers this spatial position at each frame. Ungated by
    timestep, as in the reference forward() (attention_freetraj.py:178)."""
    if traj is None or not traj.temporal_attn:
        return None
    BF, H, W, _ = shape
    F = num_frames
    B = BF // F
    fgm = freetraj_ops.fg_map(traj.paths, H, W)  # [F, H, W]
    fg = jnp.tile(fgm.transpose(1, 2, 0).reshape(H * W, F), (B, 1))
    active = jnp.ones((B * H * W,), bool)
    return {"self": {"fg": fg, "active": active}, "cross": None}


# ---------------------------------------------------------------------------
# Sub-modules
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """GN->SiLU->Conv3x3 + time-emb add + GN->SiLU->zeroConv3x3 + skip, with
    optional temporal conv block (openaimodel3d.py:115-254)."""

    out_channels: int
    use_temporal_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, num_frames: int):
        in_ch = x.shape[-1]
        gs, gb = GNParams(in_ch, name="in_norm")()
        h = fused_twrap.gn_silu(x, gs, gb)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + emb_out[:, None, None, :]

        gs2, gb2 = GNParams(self.out_channels, name="out_norm")()
        h = fused_twrap.gn_silu(h, gs2, gb2)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip_conv")(x)
        h = x + h

        if self.use_temporal_conv:
            BF, H, W, C = h.shape
            B = BF // num_frames
            h5 = h.reshape(B, num_frames, H, W, C)
            h5 = TemporalConvBlock(C, dtype=self.dtype, name="temporal_conv")(h5)
            h = h5.reshape(BF, H, W, C)
        return h


class TemporalConvBlock(nn.Module):
    """4x (GN -> SiLU -> Conv3d(3,1,1)) residual, zero-init last conv
    (openaimodel3d.py:257-309). Input [B, F, H, W, C]."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        for idx in range(4):
            gs, gb = GNParams(self.channels, name=f"norm{idx + 1}")()
            x = fused_twrap.gn_silu(x, gs, gb)
            x = nn.Conv(
                self.channels,
                (3, 1, 1),
                padding=((1, 1), (0, 0), (0, 0)),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros if idx == 3 else nn.initializers.lecun_normal(),
                name=f"conv{idx + 1}",
            )(x)
        return x + identity


class SpatialTransformer(nn.Module):
    """GN -> proj_in -> transformer over h*w tokens -> proj_out + residual
    (lvdm/modules/attention.py:223-278, use_linear=True)."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    img_cross_attention: bool = False
    text_context_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, traj=None):
        BF, H, W, C = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        # head/tail wrapper (GN -> proj_in / proj_out -> +residual) fused
        # into single Pallas passes on TPU (ops/fused_twrap.py); params are
        # declared via holder twins so the tree matches GroupNorm32/Dense
        gs, gb = GNParams(C, name="norm")()
        w_in, b_in = ProjParams(C, inner, use_bias=True, name="proj_in")()
        blocks = [
            BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=self.context_dim,
                img_cross_attention=self.img_cross_attention,
                text_context_len=self.text_context_len,
                dtype=self.dtype,
                name=f"block{d}",
            )
            for d in range(self.depth)
        ]
        w_out, b_out = ProjParams(
            inner, C, use_bias=True, zero_init=True, name="proj_out"
        )()
        xd = x.astype(self.dtype)
        if (
            self.depth == 1
            and traj is None
            and context is not None
            and fused_mega.spatial_ok(H * W, C, inner, self.heads, context.shape[-1])
        ):
            # whole transformer in ONE kernel (ops/fused_mega.py)
            lns, a1, a2, ffp = blocks[0](
                jnp.zeros((1, 1, inner), self.dtype), context=context,
                params_only=True,
            )
            return fused_mega.spatial_transformer(
                xd, context, gs, gb, w_in, b_in, lns, a1, a2, ffp,
                w_out, b_out, heads=self.heads, scale=self.dim_head**-0.5,
                text_len=self.text_context_len,
            )
        h = fused_twrap.gn_proj_in_spatial(xd, gs, gb, w_in, b_in)
        for blk in blocks:
            h = blk(h, context=context, traj=traj)
        return fused_twrap.tail_spatial(h, x_in.astype(self.dtype), w_out, b_out)


class TemporalTransformer(nn.Module):
    """GN -> proj_in -> transformer over F tokens per (b, h, w) -> proj_out
    + residual (lvdm/modules/attention.py:281-373). Input [(B F), H, W, C]."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    # use_linear only signals the converter-side weight layout (Conv1d vs
    # Linear proj_in/out in the torch ckpt, utils/weights.py conv1d_as_dense);
    # the compute path is identical Dense either way.
    use_linear: bool = True
    only_self_att: bool = True
    causal_attention: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, context=None, traj=None):
        BF, H, W, C = x.shape
        B = BF // num_frames
        F = num_frames
        inner = self.heads * self.dim_head

        x5 = x.astype(self.dtype).reshape(B, F, H, W, C)
        # GN -> frame-axis permute (tokens = frames, batch = (B H W)) ->
        # proj_in as ONE fused pass (ops/fused_twrap.py); holder twins keep
        # the param tree identical to GroupNorm32/Dense
        gs, gb = GNParams(C, name="norm")()
        w_in, b_in = ProjParams(C, inner, use_bias=True, name="proj_in")()
        blocks = [
            BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=None,
                relative_position=self.relative_position,
                temporal_length=self.temporal_length,
                dtype=self.dtype,
                name=f"block{d}",
            )
            for d in range(self.depth)
        ]
        w_out, b_out = ProjParams(
            inner, C, use_bias=True, zero_init=True, name="proj_out"
        )()

        mask = None
        if self.causal_attention:
            mask = jnp.tril(jnp.ones((1, F, F), bool))

        if not self.only_self_att and context is not None:
            # Shipped VideoCrafter configs always set temporal_selfatt_only
            # (attention.py:348-363 cross path is dead for them).
            raise NotImplementedError("cross-attn temporal transformer unused by shipped configs")

        if (
            self.depth == 1
            and mask is None
            and traj is None
            and not self.relative_position
            and fused_mega.temporal_ok(F, C, inner, self.heads, H, W)
        ):
            # whole transformer in ONE kernel (ops/fused_mega.py)
            lns, a1, a2, ffp = blocks[0](
                jnp.zeros((1, 1, inner), self.dtype), params_only=True
            )
            h5 = fused_mega.temporal_transformer(
                x5, gs, gb, w_in, b_in, lns, a1, a2, ffp, w_out, b_out,
                heads=self.heads, scale=self.dim_head**-0.5,
            )
            return h5.reshape(BF, H, W, C)

        h = fused_twrap.gn_proj_in_temporal(x5, gs, gb, w_in, b_in)
        for blk in blocks:
            h = blk(h, mask=mask, traj=traj)

        h5 = fused_twrap.tail_temporal(h, x5, w_out, b_out)
        return h5.reshape(BF, H, W, C)


class Downsample(nn.Module):
    """Conv stride-2 (openaimodel3d.py:48-79, use_conv=True, dims=2)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    """Nearest x2 + conv 3x3 (openaimodel3d.py:82-112)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        BF, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


# ---------------------------------------------------------------------------
# Full UNet
# ---------------------------------------------------------------------------


class UNet3D(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    def _make(self, spec: BlockSpec):
        cfg = self.cfg
        heads = spec.channels // cfg.num_head_channels
        if spec.kind == "conv_in":
            return nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=self.dtype, name=spec.name)
        if spec.kind == "res":
            return ResBlock(
                spec.channels, use_temporal_conv=cfg.temporal_conv, dtype=self.dtype, name=spec.name
            )
        if spec.kind == "spatial":
            return SpatialTransformer(
                spec.channels, heads, cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                img_cross_attention=cfg.use_image_attention,
                text_context_len=cfg.text_context_len,
                dtype=self.dtype, name=spec.name,
            )
        if spec.kind == "temporal":
            return TemporalTransformer(
                spec.channels, heads, cfg.num_head_channels,
                depth=cfg.transformer_depth,
                only_self_att=cfg.temporal_selfatt_only,
                causal_attention=cfg.use_causal_attention,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                dtype=self.dtype, name=spec.name,
            )
        if spec.kind == "down":
            return Downsample(spec.channels, dtype=self.dtype, name=spec.name)
        if spec.kind == "up":
            return Upsample(spec.channels, dtype=self.dtype, name=spec.name)
        raise ValueError(spec.kind)

    def setup(self):
        cfg = self.cfg
        in_specs, out_specs, mid_specs, _ = unet_layout(cfg)
        self._in_specs, self._out_specs, self._mid_specs = in_specs, out_specs, mid_specs

        self.time_embed = MLPEmbed(cfg.model_channels * 4, dtype=self.dtype, name="time_embed")
        if cfg.fps_cond:
            self.fps_embed = MLPEmbed(cfg.model_channels * 4, dtype=self.dtype, name="fps_embed")

        self.in_layers = [[self._make(s) for s in specs] for specs in in_specs]
        self.mid_layers = [self._make(s) for s in mid_specs]
        self.out_layers = [[self._make(s) for s in specs] for specs in out_specs]

        if cfg.addition_attention:
            self.init_attn = TemporalTransformer(
                cfg.model_channels, 8, cfg.num_head_channels,
                use_linear=False,
                only_self_att=cfg.temporal_selfatt_only,
                causal_attention=cfg.use_causal_attention,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                dtype=self.dtype, name="init_attn",
            )

        # GN+SiLU folded into one fused elementwise pass like every other
        # ResBlock/VAE chain; GNParams keeps the tree identical to GroupNorm32
        self.out_norm = GNParams(cfg.model_channels, name="out_norm")
        self.out_conv = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )

    def _apply_specs(self, specs, layers, h, emb, context, F,
                     no_temporal_attn=False, traj=None):
        for spec, layer in zip(specs, layers):
            if spec.kind in ("conv_in", "down", "up"):
                h = layer(h)
            elif spec.kind == "res":
                h = layer(h, emb, F)
            elif spec.kind == "spatial":
                h = layer(h, context=context,
                          traj=freetraj_spatial(traj, h.shape, F))
            elif spec.kind == "temporal":
                if not no_temporal_attn:
                    h = layer(h, num_frames=F,
                              traj=freetraj_temporal(traj, h.shape, F))
        return h

    def __call__(
        self,
        x: jnp.ndarray,  # [B, F, H, W, C]
        timesteps: jnp.ndarray,  # [B] int
        context: jnp.ndarray,  # [B, L, context_dim]
        fps,  # scalar or [B]
        no_temporal_attn: bool = False,
        traj=None,  # Optional[ops.freetraj.FreeTraj] — trajectory control
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, F, H, W, C = x.shape

        # timesteps: [B] (whole-clip) or [B, F] (per-frame — FIFO diagonal
        # denoising; the time embedding rides the (B F) batch natively)
        timesteps = jnp.asarray(timesteps)
        t_flat = (
            timesteps.reshape(B * F)
            if timesteps.ndim == 2
            else jnp.repeat(timesteps, F, axis=0)
        )
        t_emb = timestep_embedding(t_flat, cfg.model_channels).astype(self.dtype)
        emb = self.time_embed(t_emb)
        if cfg.fps_cond:
            fps = jnp.repeat(jnp.broadcast_to(jnp.asarray(fps, jnp.float32), (B,)), F, axis=0)
            emb = emb + self.fps_embed(timestep_embedding(fps, cfg.model_channels).astype(self.dtype))

        # per-frame expand: context rides the (B F) batch
        ctx = jnp.repeat(context, F, axis=0).astype(self.dtype)  # [(B F), L, D]

        h = x.reshape(B * F, H, W, C).astype(self.dtype)

        hs = []
        for i, (specs, layers) in enumerate(zip(self._in_specs, self.in_layers)):
            h = self._apply_specs(specs, layers, h, emb, ctx, F,
                                  no_temporal_attn, traj)
            if i == 0 and cfg.addition_attention and not no_temporal_attn:
                h = self.init_attn(h, num_frames=F,
                                   traj=freetraj_temporal(traj, h.shape, F))
            hs.append(h)

        h = self._apply_specs(self._mid_specs, self.mid_layers, h, emb, ctx, F,
                              no_temporal_attn, traj)

        for specs, layers in zip(self._out_specs, self.out_layers):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_specs(specs, layers, h, emb, ctx, F,
                                  no_temporal_attn, traj)

        gs_out, gb_out = self.out_norm()
        h = fused_twrap.gn_silu(h, gs_out, gb_out, eps=1e-5)
        y = self.out_conv(h)
        y = y.astype(jnp.float32)
        return y.reshape(B, F, H, W, cfg.out_channels)
