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
