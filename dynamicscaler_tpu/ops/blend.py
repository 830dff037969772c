"""Latent blending primitives (overlap merging).

Reference: utils/tensor_utils.py:19-38 (`mix_latents_with_mask`). Pure
elementwise ops — XLA fuses these into surrounding kernels for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def mix_with_mask(
    latent_1: jnp.ndarray,
    latent_to_add: jnp.ndarray,
    mask: jnp.ndarray,
    mix_ratio,
) -> jnp.ndarray:
    """Outside ``mask``: ``latent_1`` unchanged. Inside ``mask``:
    ``(1-mix_ratio)*latent_1 + mix_ratio*latent_to_add``.

    ``mask`` broadcasts against the latents (the reference expands a
    [H, W] mask across B/F/C; with broadcasting that is automatic).
    ``mix_ratio`` may be a scalar or a per-frame broadcastable array.
    """
    mixed = latent_1 * (1.0 - mix_ratio) + latent_to_add * mix_ratio
    return latent_1 * (1.0 - mask) + mixed * mask


def checkerboard_mix(cur: jnp.ndarray, residual: jnp.ndarray, ratio, parity) -> jnp.ndarray:
    """Sparse residual merge on a step-parity checkerboard over (H, W)
    (t2v_normal_pipeline.py:462-466 ``sparse_add_residual``): half the
    pixels blend ``ratio*cur + (1-ratio)*residual`` each step, alternating
    the lattice with ``parity`` so every pixel is refreshed every 2 steps.

    The reference's torch indexing additionally reads ``cur`` from
    *row-shifted* positions (an artifact of its strided assignment); here
    the blend is in-place per pixel — the documented intent.

    cur/residual: [B, F, H, W, C]; parity: traced int (step index).
    """
    B, F, H, W, C = cur.shape
    hh = jnp.arange(H)[:, None]
    ww = jnp.arange(W)[None, :]
    checker = ((hh + ww + parity) % 2 == 0)[None, None, :, :, None]
    mixed = ratio * cur + (1.0 - ratio) * residual
    return jnp.where(checker, mixed, cur)


def normalize_accumulated(accum: jnp.ndarray, count: jnp.ndarray, fallback: jnp.ndarray = None) -> jnp.ndarray:
    """Divide scatter-accumulated values by their hit counts; where count==0
    keep ``fallback`` (or zero). The commutative overlap-average used for
    parallel window scatter and tiled VAE encode
    (i2v_sphere_panorama_pipeline.py:546-560)."""
    safe = jnp.maximum(count, 1.0)
    avg = accum / safe
    if fallback is None:
        return jnp.where(count > 0, avg, 0.0)
    return jnp.where(count > 0, avg, fallback)
