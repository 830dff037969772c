"""Attention stack for the LVDM UNet.

TPU-native rebuild of lvdm/modules/attention.py:21-373. Differences from the
torch/xformers reference, by design:

* One fused attention primitive (`scaled_attention`) replaces both the
  einsum path and xformers `memory_efficient_attention` — XLA fuses the
  softmax chain on TPU (see ops/attention.py dispatch).
* Temporal self-attention sub-blocks (LN -> QKV -> 16-token attention ->
  out-proj -> residual) run as ONE Pallas kernel on TPU
  (ops/fused_temporal.py), row-tiled over (B*H*W) in the native
  [rows, F, C] layout. To hand the kernel raw weight arrays while keeping
  the parameter tree bit-identical to nn.Dense/nn.LayerNorm (same
  converter, same checkpoints), projections are declared via param-holder
  modules and applied manually.
* Dual text+image cross-attention (attention.py:116-124) = two attentions
  over split KV, summed with scale 1.0.
* Temporal relative-position bias (attention.py:21-40,94-113) folds into the
  logits/output as einsum terms (XLA path only; shipped VideoCrafter configs
  set use_relative_position false).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dynamicscaler_tpu.models.layers import (
    FeedForward,
    LNParams,
    ProjParams,
    layer_norm,
)
from dynamicscaler_tpu.ops import freetraj as freetraj_ops
from dynamicscaler_tpu.ops import fused_block, fused_spatial, fused_temporal
from dynamicscaler_tpu.ops.attention import attention as _fused_attention


def scaled_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over [B, H, N, D]: dispatches to chunked online-softmax /
    fp32-einsum by shape+platform (see ops/attention.py)."""
    return _fused_attention(q, k, v, scale, bias=bias, mask=mask)


class CrossAttention(nn.Module):
    """Self/cross attention with optional dual image-KV and temporal
    relative-position bias (lvdm/modules/attention.py:43-127).

    When `ln` (scale, bias) is passed, the pre-attention LayerNorm is applied
    here — so the temporal self-attention case can run the whole
    LN->QKV->attn->out-proj->residual sub-block as one Pallas kernel."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # None -> self attention
    img_cross_attention: bool = False
    text_context_len: int = 77
    relative_position: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def _traj_attention(self, qh, kh, vh, scale, mask, traj):
        """FreeTraj-re-weighted attention (reference
        attention_freetraj.py:178-230 temporal multiplicative mask,
        :319-389 spatial self/cross). ``traj`` is a per-call dict built by
        the transformer wrappers (models/unet3d.py): self-attention gets
        {fg: [B, N] 0/1, active: [B] bool}; cross-attention additionally
        {fg_tok: [M_text] bool, wadd: [B, N] post-softmax bump}. Logits are
        computed explicitly here — the rank-1 re-weighting fuses into the
        XLA softmax chain, never materialized standalone."""
        assert not self.relative_position, "FreeTraj + rel-pos unsupported"
        logits = (
            jnp.einsum("bhnd,bhmd->bhnm", qh, kh).astype(jnp.float32) * scale
        )
        act = traj["active"][:, None, None, None]  # [B,1,1,1]
        if "fg_tok" not in traj:
            # self (spatial tokens or frame tokens): multiplicative fg/bg
            # pairing, coef floor — reference sim *= sim_mask
            mul = freetraj_ops.pair_mul(traj["fg"].astype(jnp.float32))
            logits = jnp.where(act, logits * mul[:, None], logits)
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
        else:
            # cross (attention_freetraj.py:352-389): at active frames, ALL
            # text logits of in-box queries are floored to finfo.min (the
            # row softmaxes to uniform) and target-word columns are floored
            # for out-of-box queries; the target word then gets the
            # post-softmax gaussian bump inside the box.
            fgq = traj["fg"] > 0.5  # [B, N]
            blocked = traj["active"][:, None, None, None] & (
                fgq[:, None, :, None] | traj["fg_tok"][None, None, None, :]
            )
            logits = jnp.where(blocked, jnp.finfo(jnp.float32).min, logits)
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            wadd = (
                traj["wadd"].astype(jnp.float32)[:, None, :, None]
                * traj["fg_tok"][None, None, None, :]
            )
            probs = probs + jnp.where(act, wadd, 0.0)
        return jnp.einsum(
            "bhnm,bhmd->bhnd", probs.astype(vh.dtype), vh
        )

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        mask=None,
        ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        add_residual: bool = False,
        params_only: bool = False,
        traj: Optional[dict] = None,
    ):
        h, d = self.heads, self.dim_head
        inner = h * d
        scale = d**-0.5
        B, N, Cq = x.shape
        dt = self.dtype
        # one compute dtype for both the fused kernel (computes in x.dtype)
        # and the unfused fallback (computes in self.dtype) — ADVICE r2
        x = x.astype(dt)

        use_img = self.img_cross_attention and context is not None
        ctx_dim = Cq if context is None else context.shape[-1]

        wq, _ = ProjParams(Cq, inner, name="to_q")()
        wk, _ = ProjParams(ctx_dim, inner, name="to_k")()
        wv, _ = ProjParams(ctx_dim, inner, name="to_v")()
        wo, bo = ProjParams(inner, Cq, use_bias=True, name="to_out")()

        if params_only:
            # declare the exact same tree and hand the raw arrays to a
            # caller-side fused kernel (ops/fused_block.py). rel-pos tables
            # are declared for tree parity but never exported (the block
            # kernels gate on `not relative_position`).
            if self.relative_position:
                assert self.temporal_length is not None
                self.param("rel_pos_k", nn.initializers.xavier_uniform(),
                           (2 * self.temporal_length + 1, d))
                self.param("rel_pos_v", nn.initializers.xavier_uniform(),
                           (2 * self.temporal_length + 1, d))
            if use_img:
                wk_ip, _ = ProjParams(ctx_dim, inner, name="to_k_ip")()
                wv_ip, _ = ProjParams(ctx_dim, inner, name="to_v_ip")()
                return (wq, wk, wv, wk_ip, wv_ip, wo, bo)
            return (wq, wk, wv, wo, bo)

        if (
            traj is None
            and ln is not None
            and context is None
            and mask is None
            and not self.relative_position
        ):
            if fused_temporal.fusable(N, inner, Cq, h):
                return fused_temporal.fused_ln_attention(
                    x, ln[0], ln[1], wq, wk, wv, wo, bo,
                    heads=h, scale=scale, add_residual=add_residual,
                )
            if fused_spatial.fusable(N, inner, Cq, h):
                return fused_spatial.fused_ln_spatial_attention(
                    x, ln[0], ln[1], wq, wk, wv, wo, bo,
                    heads=h, scale=scale, add_residual=add_residual,
                )

        if (
            traj is None
            and ln is not None
            and context is not None
            and mask is None
            and not self.relative_position
            and fused_spatial.cross_fusable(N, inner, Cq, h, ctx_dim)
        ):
            wk_ip = wv_ip = None
            if use_img:
                wk_ip, _ = ProjParams(ctx_dim, inner, name="to_k_ip")()
                wv_ip, _ = ProjParams(ctx_dim, inner, name="to_v_ip")()
            return fused_spatial.fused_ln_cross_attention(
                x, context, ln[0], ln[1], wq, wk, wv, wo, bo,
                wk_ip, wv_ip, heads=h, scale=scale,
                text_len=self.text_context_len, add_residual=add_residual,
            )

        x_res = x
        xn = layer_norm(x, ln[0], ln[1], dtype=dt) if ln is not None else x
        ctx = xn if context is None else context
        ctx_txt = ctx[:, : self.text_context_len] if use_img else ctx

        q = jnp.dot(xn.astype(dt), wq.astype(dt))
        k = jnp.dot(ctx_txt.astype(dt), wk.astype(dt))
        v = jnp.dot(ctx_txt.astype(dt), wv.astype(dt))

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
            k2 = table_k[idx].astype(dt)  # [N, M, d]
            bias = jnp.einsum("bhnd,nmd->bhnm", qh, k2) * scale

        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]  # [B, 1, N, M]

        if traj is not None:
            out = self._traj_attention(qh, kh, vh, scale, mask, traj)
        else:
            out = scaled_attention(qh, kh, vh, scale, bias=bias, mask=mask)

        if self.relative_position:
            # second-order value term: probs @ rel_v — recompute probs
            logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * scale + bias
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qh.dtype)
            v2 = table_v[idx].astype(dt)
            out = out + jnp.einsum("bhnm,nmd->bhnd", probs, v2)

        if use_img:
            ctx_img = ctx[:, self.text_context_len :]
            wk_ip, _ = ProjParams(ctx_dim, inner, name="to_k_ip")()
            wv_ip, _ = ProjParams(ctx_dim, inner, name="to_v_ip")()
            k_ip = jnp.dot(ctx_img.astype(dt), wk_ip.astype(dt))
            v_ip = jnp.dot(ctx_img.astype(dt), wv_ip.astype(dt))
            out_ip = scaled_attention(qh, split(k_ip), split(v_ip), scale)
            out = out + 1.0 * out_ip  # image_cross_attention_scale = 1.0

        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = jnp.dot(out, wo.astype(dt)) + bo.astype(dt)
        if add_residual:
            out = out + x_res
        return out


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF with pre-LayerNorms
    (lvdm/modules/attention.py:187-220). norm1/norm2 params are declared
    here but applied inside CrossAttention (fused on TPU for temporal
    self-attention)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    img_cross_attention: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None
    text_context_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, params_only: bool = False,
                 traj: Optional[dict] = None):
        # traj: {"self": <dict|None>, "cross": <dict|None>} — FreeTraj
        # re-weighting per attention class (see CrossAttention._traj_attention)
        traj_self = traj.get("self") if traj else None
        traj_cross = traj.get("cross") if traj else None
        s1, b1 = LNParams(self.dim, name="norm1")()
        s2, b2 = LNParams(self.dim, name="norm2")()
        attn_kwargs = dict(
            heads=self.heads,
            dim_head=self.dim_head,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            dtype=self.dtype,
        )
        attn1 = CrossAttention(name="attn1", **attn_kwargs)
        attn2 = CrossAttention(
            name="attn2",
            context_dim=self.context_dim,
            img_cross_attention=self.img_cross_attention,
            text_context_len=self.text_context_len,
            **attn_kwargs,
        )
        ffm = FeedForward(self.dim, dtype=self.dtype, name="ff")

        if params_only:
            # raw weight bundle for a caller-side fused mega kernel
            # (ops/fused_mega.py); tree identical to the compute path
            a1 = attn1(x, params_only=True)
            a2 = attn2(x, context=context, params_only=True)
            s3, b3 = LNParams(self.dim, name="norm3")()
            ffp = ffm(x, params_only=True)
            return (s1, b1, s2, b2, s3, b3), a1, a2, ffp

        inner = self.heads * self.dim_head
        N = x.shape[1]
        # whole-block fused kernel (ops/fused_block.py): all three
        # sub-blocks in one pallas_call, activation tile VMEM-resident
        whole_block = (
            mask is None
            and traj_self is None
            and traj_cross is None
            and not self.relative_position
            and (
                fused_block.temporal_block_fusable(N, inner, self.dim, self.heads)
                if context is None
                else fused_block.spatial_block_fusable(
                    N, inner, self.dim, self.heads, context.shape[-1]
                )
            )
        )
        if whole_block:
            a1 = attn1(x, params_only=True)
            a2 = attn2(x, context=context, params_only=True)
            s3, b3 = LNParams(self.dim, name="norm3")()
            ffp = ffm(x, params_only=True)
            lns = (s1, b1, s2, b2, s3, b3)
            xd = x.astype(self.dtype)
            scale = self.dim_head**-0.5
            if context is None:
                return fused_block.fused_temporal_block(
                    xd, lns, a1, a2, ffp, heads=self.heads, scale=scale
                )
            return fused_block.fused_spatial_block(
                xd, context, lns, a1, a2, ffp, heads=self.heads, scale=scale,
                text_len=self.text_context_len,
            )

        x = attn1(x, mask=mask, ln=(s1, b1), add_residual=True, traj=traj_self)
        x = attn2(x, context=context, mask=mask, ln=(s2, b2), add_residual=True,
                  traj=traj_cross)
        s3, b3 = LNParams(self.dim, name="norm3")()
        x = ffm(x, ln=(s3, b3), add_residual=True)
        return x
