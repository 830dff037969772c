"""Pre-encoded latent helpers: image file(s) -> video latent tensors.

Reference: utils/precast_latent_utils.py:13-65 (single-image encode, folder
globbing sorted by ``window_N`` name, list -> frame-stacked latent).
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np
import jax.numpy as jnp

from dynamicscaler_tpu.utils.io import load_image


def get_img_list_from_folder(folder: str, exts=(".png", ".jpg", ".jpeg")) -> List[str]:
    """Image paths sorted by the trailing ``_N`` window index in the name
    (precast_latent_utils.py:13-21, 42-46)."""

    def sort_key(name):
        m = re.search(r"(\d+)(?=\.\w+$)", name)
        return int(m.group(1)) if m else 0

    files = [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder), key=sort_key)
        if f.lower().endswith(exts)
    ]
    return files


def encode_image_to_latent(model, image_path: str, height: int, width: int) -> jnp.ndarray:
    """One image -> [1, 1, h, w, zc] scaled latent (precast:34-40)."""
    img = load_image(image_path, height, width)
    return model.encode_video(jnp.asarray(img)[None, None])


def encode_images_list_to_latent_tensor(
    model, image_paths: List[str], height: int, width: int
) -> jnp.ndarray:
    """Images -> frame-stacked [1, N, h, w, zc] latent, batched through the
    VAE in one call (precast:48-65 loops per image)."""
    imgs = np.stack([load_image(p, height, width) for p in image_paths])
    return model.encode_video(jnp.asarray(imgs)[None]) if imgs.ndim == 4 else None


def encode_folder_to_latent_tensor(model, folder: str, height: int, width: int) -> jnp.ndarray:
    return encode_images_list_to_latent_tensor(
        model, get_img_list_from_folder(folder), height, width
    )
