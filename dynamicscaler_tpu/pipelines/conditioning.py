"""Conditioning preparation: text/image context assembly + CFG uncond.

Reference: pipeline/*_pipeline.py "3. Encode input prompt" / "3.5 Prepare
CFG" sections (e.g. i2v_sphere_panorama_pipeline.py:100-137) and the
multi-prompt selection util (utils/multi_prompt_utils.py:1-8).

The key TPU-side redesign: per-window conditioning depends only on the
finite set of step *phases* (window offsets cycle with ``loop_step``), so
all CLIP forwards happen up front, batched, and the sampling loop consumes
precomputed context arrays.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def select_prompt_by_factor(prompt_dict: Dict[float, str], factor: float) -> str:
    """Pick the prompt whose sorted key >= factor
    (utils/multi_prompt_utils.py:1-8)."""
    assert 0.0 <= factor <= 1.0, f"select_prompt factor {factor} not legal"
    for key in sorted(prompt_dict.keys()):
        if factor <= key:
            return prompt_dict[key]
    return prompt_dict[sorted(prompt_dict.keys())[-1]]


def encode_texts_cached(model, texts: Sequence[str], cache: dict):
    """Batch-encode unique uncached prompts once; return [len(texts), 77, D]."""
    missing = [t for t in dict.fromkeys(texts) if t not in cache]
    if missing:
        embs = model.encode_text(list(missing))
        for i, t in enumerate(missing):
            cache[t] = embs[i]
    return jnp.stack([cache[t] for t in texts])


def build_uncond_context(model, batch: int = 1, with_image: bool = None,
                         image_hw=None, uncond_type: str = "empty_seq",
                         cond_like: jnp.ndarray = None) -> jnp.ndarray:
    """CFG uncond context (scripts/evaluation/funcs.py:19-35):

    * ``empty_seq`` (both shipped configs, ddpm3d.py:338): empty-prompt
      text emb, plus (i2v) the embedding of a zero image
      (i2v_sphere_panorama_pipeline.py:111-137 — the reference feeds the
      zero image at *latent* resolution h//8 x w//8);
    * ``zero_embed``: zeros shaped like the TEXT part of the cond context
      (``cond_like``); for image-conditioned models the reference still
      appends the real CLIP embedding of a zero image (funcs.py:29-34).
      (The reference zeroes the FULL imtext context and then appends the
      zero-image tokens on top — giving uncond 16 more tokens than cond,
      which only works because its legacy sampler runs cond/uncond as
      separate forwards. We zero the text part only, so the CFG pair
      stays batchable; both shipped configs use empty_seq anyway.)
    """
    if with_image is None:
        with_image = model.image_encoder is not None
    if uncond_type == "zero_embed":
        if with_image:
            import warnings

            warnings.warn(
                "zero_embed uncond on an image-conditioned model: this zeroes "
                "only the text part and keeps the CFG pair batchable; the "
                "reference (funcs.py:24-34) zeroes the full cond embedding and "
                "appends zero-image tokens (uncond gets 16 extra tokens). Both "
                "shipped configs use empty_seq — verify parity before using "
                "zero_embed with real image-conditioned weights.",
                stacklevel=2,
            )
        assert cond_like is not None, "zero_embed needs the cond context shape"
        text_len = getattr(model.config.unet, "text_context_len", 77)
        uc_text = jnp.zeros(
            (batch, min(text_len, cond_like.shape[1])) + cond_like.shape[2:],
            cond_like.dtype,
        )
    else:
        assert uncond_type == "empty_seq", uncond_type
        uc_text = model.encode_text([""] * batch)
    if not with_image:
        return uc_text
    h, w = image_hw if image_hw is not None else (40, 64)
    uc_img = model.encode_image_cond(jnp.zeros((batch, h, w, 3)))
    return jnp.concatenate([uc_text, uc_img], axis=1)


def cat_text_image(text_emb: jnp.ndarray, img_emb: jnp.ndarray) -> jnp.ndarray:
    """imtext context = [text tokens ; image tokens] (split again at 77
    inside dual cross-attention)."""
    return jnp.concatenate([text_emb, img_emb], axis=1)
