"""Video-latent spatial resize (stage-to-stage rescaling) and frame padding.

Reference: utils/diffusion_utils.py:4-36. jax.image.resize uses half-pixel
centers, matching torch ``F.interpolate(align_corners=False)`` for
bilinear/bicubic and exact decimation for nearest at integer factors.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


_METHOD_MAP = {
    "nearest": "nearest",
    "bilinear": "bilinear",
    "bicubic": "bicubic",
    "cubic": "bicubic",
    "linear": "bilinear",
}


def resize_video_latent(
    latent: jnp.ndarray,
    target_height: int,
    target_width: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Per-frame spatial resize of a ``[B, F, H, W, C]`` latent."""
    B, F, H, W, C = latent.shape
    if mode == "nearest":
        # torch legacy 'nearest': src = floor(dst * in/out) — asymmetric, NOT
        # half-pixel. Implemented as two gathers for exact parity.
        hi = jnp.floor(jnp.arange(target_height) * (H / target_height)).astype(jnp.int32)
        wi = jnp.floor(jnp.arange(target_width) * (W / target_width)).astype(jnp.int32)
        return latent[:, :, hi[:, None], wi[None, :], :]
    if mode in ("bicubic", "cubic"):
        # torch bicubic uses the Keys kernel with a = -0.75 (jax uses -0.5),
        # half-pixel centers, edge clamp. Separable gather+weight.
        lat = _cubic_resample_axis(latent, 2, target_height)
        lat = _cubic_resample_axis(lat, 3, target_width)
        return lat
    method = _METHOD_MAP[mode]
    return jax.image.resize(
        latent, (B, F, target_height, target_width, C), method=method
    )


def _cubic_kernel(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w1 = (a + 2) * ax3 - (a + 3) * ax2 + 1
    w2 = a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a
    return jnp.where(ax <= 1, w1, jnp.where(ax < 2, w2, 0.0))


def _cubic_resample_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    scale = in_size / out_size
    # half-pixel source coordinates (align_corners=False)
    coords = (jnp.arange(out_size) + 0.5) * scale - 0.5
    base = jnp.floor(coords).astype(jnp.int32)
    frac = coords - base
    offsets = jnp.arange(-1, 3)
    idx = jnp.clip(base[:, None] + offsets[None, :], 0, in_size - 1)  # [out, 4]
    wts = _cubic_kernel(frac[:, None] - offsets[None, :].astype(coords.dtype))  # [out, 4]
    wts = wts / jnp.sum(wts, axis=1, keepdims=True)
    gathered = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [out_size, 4]
    gathered = gathered.reshape(new_shape)
    wshape = [1] * len(new_shape)
    wshape[axis], wshape[axis + 1] = out_size, 4
    return jnp.sum(gathered * wts.reshape(wshape).astype(x.dtype), axis=axis + 1)


def pad_frames_front(latent: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat the first frame ``n`` times at the front (diffusion_utils.py:4)."""
    first = jnp.repeat(latent[:, :1], n, axis=1)
    return jnp.concatenate([first, latent], axis=1)


def pad_frames_end(latent: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat the last frame ``n`` times at the end (diffusion_utils.py:13)."""
    last = jnp.repeat(latent[:, -1:], n, axis=1)
    return jnp.concatenate([latent, last], axis=1)
