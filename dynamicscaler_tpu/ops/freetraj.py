"""FreeTraj trajectory control — path planning + attention re-weighting.

TPU-native rebuild of the reference's FreeTraj machinery
(lvdm/modules/attention_freetraj.py:29-56 gaussian weight, :131-249
temporal logit re-weighting, :252-421 spatial self/cross masking;
lvdm/modules/networks/openaimodel3d_freetraj.py:36-44 kwargs threading).
In the reference this entire feature is UNRUNNABLE dead code: it imports
``utils.utils_freetraj`` (attention_freetraj.py:26), which does not exist
in the reference tree, and no shipped config instantiates the variant.
This module makes it work.

Semantics (FreeTraj: a per-frame foreground box rides a planned path):

* temporal attention: frame-pair logits are multiplied by
  ``coef + (1-coef) * (fg_i*fg_j + bg_i*bg_j)`` per spatial position —
  fg tokens attend to frames where the box covers the same position.
* spatial self-attention: token-pair logits within a frame get the same
  rank-1 re-weighting from that frame's box indicator.
* cross-attention: background text tokens are hard-masked (-inf) for
  queries inside the box, and the target word's post-softmax attention is
  raised by a gaussian bump centred on the box.

Deliberate design differences from the reference (cited so the parity
tests can check them):

* ``plan_path`` (linear keyframe interpolation) is reimplemented — the
  reference imports it from the missing module.
* Masks are never materialized at ``[F, N, N]``: attention receives the
  per-token fg indicator (``[B, N]``) and composes the rank-1
  re-weighting inside the XLA-fused logits computation
  (models/attention.py), so the extra HBM cost is O(B*N), not O(B*N^2).
* Level dims (H, W) are exact trace-time constants. The reference infers
  them from token counts assuming the 40x64 base aspect and batch 1 — and
  its temporal path swaps the h/w axes in the process
  (attention_freetraj.py:152-155: ``w_len`` evaluates to the HEIGHT).
  We do not reproduce that bug; tests oracle against the imported
  reference module on square shapes where the swap is identity.

Everything here is a pure function of (paths, shape) and jits: box
positions are traced values, shapes are static.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

COEF = 0.01  # reference attention_freetraj.py:215,340 — off-pair logit keep


@struct.dataclass
class FreeTraj:
    """Trajectory state threaded through the UNet (pytree).

    ``paths``: [F, 4] per-frame box (h0, h1, w0, w1) fractions of the
    latent extent. ``active``: [B, F] bool — per batch element and frame,
    whether spatial masking applies at the current timestep (the reference
    gates on ``t > use_free_traj_time_step_thres``,
    attention_freetraj.py:304-312); temporal re-weighting is ungated, as
    in the reference forward(). ``fg_tok``: [text_len] bool — target word
    positions (the reference's ``idx_list``, default token 2).
    Static flags select which attention classes are re-weighted
    (the reference's ``use_freetraj`` dict).
    """

    paths: jnp.ndarray
    active: jnp.ndarray
    fg_tok: jnp.ndarray
    temporal_attn: bool = struct.field(pytree_node=False, default=True)
    self_attn: bool = struct.field(pytree_node=False, default=True)
    cross_attn: bool = struct.field(pytree_node=False, default=True)


def plan_path(
    keyframes: Sequence[Sequence[float]], n_frames: int
) -> np.ndarray:
    """Interpolate box keyframes to a per-frame path.

    ``keyframes``: rows ``(frame_idx, h0, h1, w0, w1)`` with fractions in
    [0, 1]; frame_idx may be an int index or a [0, 1] fraction of the clip.
    Linear interpolation between consecutive keyframes, held flat outside
    the keyframed range. Returns float32 [n_frames, 4] = (h0, h1, w0, w1).

    Replaces the reference's ``utils.utils_freetraj.plan_path`` import
    (attention_freetraj.py:26 — module absent upstream).
    """
    kf = np.asarray(keyframes, np.float64)
    assert kf.ndim == 2 and kf.shape[1] == 5, "keyframes rows: (f, h0, h1, w0, w1)"
    f = kf[:, 0].copy()
    if np.all(f <= 1.0):  # fractions -> frame indices
        f = f * (n_frames - 1)
    order = np.argsort(f)
    f, boxes = f[order], kf[order, 1:]
    out = np.empty((n_frames, 4), np.float64)
    for c in range(4):
        out[:, c] = np.interp(np.arange(n_frames), f, boxes[:, c])
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def gaussian_weight(height: int, width: int, kernel_division: float = 3.0) -> jnp.ndarray:
    """Max-normalized 2D gaussian over a [height, width] grid
    (attention_freetraj.py:29-56 incl. the linspace(0, n, n) spacing and
    int(n/2) mean)."""
    x = jnp.linspace(0.0, float(height), height)[:, None]
    y = jnp.linspace(0.0, float(width), width)[None, :]
    sx = height / kernel_division
    sy = width / kernel_division
    g = (1.0 / (2 * math.pi * sx * sy)) * jnp.exp(
        -((x - int(height / 2)) ** 2 / (2 * sx**2) + (y - int(width / 2)) ** 2 / (2 * sy**2))
    )
    return g / g.max()


_EPS = 1e-3  # absorbs float32 path noise: a box meant to span exactly k
# cells must floor to k even when (p1-p0)*len lands at k-1e-7 (the
# reference computes sizes ONCE from the first keyframe in float64 and so
# never sees per-frame rounding noise; we recompute per frame)


def box_grid(paths: jnp.ndarray, h_len: int, w_len: int):
    """Per-frame integer box (h_start, sub_h, w_start, sub_w) at a level's
    latent grid, with the reference's floor/min-1 semantics
    (attention_freetraj.py:163-165,284-286). paths: [F, 4] fractions."""
    p = jnp.asarray(paths, jnp.float32)
    h0 = jnp.floor(p[:, 0] * h_len + _EPS).astype(jnp.int32)
    w0 = jnp.floor(p[:, 2] * w_len + _EPS).astype(jnp.int32)
    sub_h = jnp.maximum(
        jnp.floor((p[:, 1] - p[:, 0]) * h_len + _EPS).astype(jnp.int32), 1
    )
    sub_w = jnp.maximum(
        jnp.floor((p[:, 3] - p[:, 2]) * w_len + _EPS).astype(jnp.int32), 1
    )
    return h0, sub_h, w0, sub_w


def fg_map(paths: jnp.ndarray, h_len: int, w_len: int) -> jnp.ndarray:
    """[F, h_len, w_len] float32 0/1 foreground-box indicator per frame."""
    h0, sub_h, w0, sub_w = box_grid(paths, h_len, w_len)
    hh = jnp.arange(h_len)[None, :]  # [1, H]
    ww = jnp.arange(w_len)[None, :]
    in_h = (hh >= h0[:, None]) & (hh < (h0 + sub_h)[:, None])  # [F, H]
    in_w = (ww >= w0[:, None]) & (ww < (w0 + sub_w)[:, None])  # [F, W]
    return (in_h[:, :, None] & in_w[:, None, :]).astype(jnp.float32)


def pair_mul(fg: jnp.ndarray, coef: float = COEF) -> jnp.ndarray:
    """Rank-1 logit re-weighting ``coef + (1-coef)(fg_i fg_j + bg_i bg_j)``
    from a per-token indicator fg: [..., N] -> [..., N, N]. Callers place
    this inside the logits computation so XLA fuses the broadcast (never
    materialize it standalone at large N)."""
    bg = 1.0 - fg
    return coef + (1.0 - coef) * (
        fg[..., :, None] * fg[..., None, :] + bg[..., :, None] * bg[..., None, :]
    )


def cross_weight_map(paths: jnp.ndarray, h_len: int, w_len: int,
                     n_fg_tokens) -> jnp.ndarray:
    """[F, h_len, w_len] post-softmax attention bump for the target word:
    the max-normalized gaussian pasted into each frame's box, scaled by
    ``0.25 / box_area_frac / n_fg_tokens`` (attention_freetraj.py:317-318,
    380). Box size varies per frame here (superset of the reference, which
    fixes it from the first keyframe). ``n_fg_tokens`` may be a traced
    scalar (e.g. ``fg_tok.sum()``)."""
    p = jnp.asarray(paths, jnp.float32)
    h0, sub_h, w0, sub_w = box_grid(paths, h_len, w_len)
    area = (p[:, 1] - p[:, 0]) * (p[:, 3] - p[:, 2])  # [F] fractions
    n_fg = jnp.maximum(jnp.asarray(n_fg_tokens, jnp.float32), 1.0)
    coef_a = 0.25 / jnp.maximum(area, 1e-6) / n_fg

    hh = jnp.arange(h_len, dtype=jnp.float32)[None, :]  # [1, H]
    ww = jnp.arange(w_len, dtype=jnp.float32)[None, :]
    # reference evaluates gaussian_weight(sub_h, sub_w) on a
    # linspace(0, sub, sub) grid then pastes at (h0, w0): grid point i maps
    # to coordinate i * sub/(sub-1), mean at int(sub/2)
    fh = (hh - h0[:, None]).astype(jnp.float32)  # in-box index along H
    fw = (ww - w0[:, None]).astype(jnp.float32)
    sh = sub_h.astype(jnp.float32)[:, None]
    sw = sub_w.astype(jnp.float32)[:, None]
    xh = fh * sh / jnp.maximum(sh - 1.0, 1.0)
    xw = fw * sw / jnp.maximum(sw - 1.0, 1.0)
    mh = jnp.floor(sh / 2.0)
    mw = jnp.floor(sw / 2.0)
    gx = jnp.exp(-((xh - mh) ** 2) / (2 * (sh / 3.0) ** 2))  # [F, H]
    gy = jnp.exp(-((xw - mw) ** 2) / (2 * (sw / 3.0) ** 2))  # [F, W]
    in_h = (hh >= h0[:, None]) & (hh < (h0 + sub_h)[:, None])
    in_w = (ww >= w0[:, None]) & (ww < (w0 + sub_w)[:, None])
    g = gx[:, :, None] * gy[:, None, :] * (in_h[:, :, None] & in_w[:, None, :])
    gmax = jnp.maximum(g.max(axis=(1, 2), keepdims=True), 1e-20)
    return g / gmax * coef_a[:, None, None]


def fg_token_mask(text_len: int, fg_token_ids: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """[text_len] bool — True at the target-word positions (the
    reference's ``idx_list``; default token index 2,
    attention_freetraj.py:373-375)."""
    ids = list(fg_token_ids) if fg_token_ids else [2]
    m = np.zeros((text_len,), bool)
    m[np.asarray(ids, int)] = True
    return jnp.asarray(m)


def make_freetraj(
    keyframes: Sequence[Sequence[float]],
    n_frames: int,
    text_len: int = 77,
    fg_token_ids: Optional[Sequence[int]] = None,
    batch: int = 1,
    *,
    temporal_attn: bool = True,
    self_attn: bool = True,
    cross_attn: bool = True,
) -> FreeTraj:
    """Build a FreeTraj pytree with everything active (``active`` is
    re-gated per step by the sampler from the timestep threshold)."""
    return FreeTraj(
        paths=jnp.asarray(plan_path(keyframes, n_frames)),
        active=jnp.ones((batch, n_frames), bool),
        fg_tok=fg_token_mask(text_len, fg_token_ids),
        temporal_attn=temporal_attn,
        self_attn=self_attn,
        cross_attn=cross_attn,
    )


def gate_active(traj: FreeTraj, timesteps: jnp.ndarray, thres: float,
                batch: int, n_frames: int) -> FreeTraj:
    """Recompute ``active`` from the current timestep(s): spatial masking
    applies while ``t > thres`` (attention_freetraj.py:304-312). Accepts
    [B], [B, F] or scalar timesteps."""
    t = jnp.asarray(timesteps, jnp.float32)
    if t.ndim == 0:
        t = jnp.full((batch, n_frames), t)
    elif t.ndim == 1:
        t = jnp.broadcast_to(t[:, None], (batch, n_frames))
    return traj.replace(active=t > thres)
