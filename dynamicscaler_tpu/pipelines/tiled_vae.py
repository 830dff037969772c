"""Tiled VAE encode + ring-aware (wrap-padded) decode.

Reference:
* tiled encode — 4x4 overlapping tiles, overlap-cropped, count-averaged
  (i2v_sphere_panorama_pipeline.py:498-563). Here all tiles ride the batch
  axis: one VAE program instead of 16 sequential encodes.
* ring-aware decode — the planar pipelines wrap-pad the latent width by
  1/16th on each side before decoding so the seam column sees its ring
  neighbourhood, then crop (i2v_sphere_panorama_pipeline.py:974-991).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion


def tiled_vae_encode(
    model: LatentVideoDiffusion,
    image: jnp.ndarray,  # [H, W, 3] or [B, H, W, 3], range [-1, 1]
    h_tiles: int = 4,
    w_tiles: int = 4,
    overlap_latent: int = 32,
    params=None,
) -> jnp.ndarray:
    """Encode a large image with overlapping VAE tiles, averaging overlaps.

    Returns ``[B, 1, H/vs, W/vs, zc]`` (a one-frame video latent).

    All ``h_tiles*w_tiles`` tiles are encoded in ONE batched VAE call; since
    interior tiles share their (tile + 2*overlap) shape, XLA compiles a
    single conv program (edge tiles are padded by clamping the crop window
    inside the image, then the overlap crop removes exactly the right
    amount, reproducing the reference's count-average).
    """
    if image.ndim == 3:
        image = image[None]
    B, H, W, C = image.shape
    vs = model.config.vae.spatial_scale
    Hl, Wl = H // vs, W // vs
    tile_h_l, tile_w_l = Hl // h_tiles, Wl // w_tiles
    tile_h, tile_w = tile_h_l * vs, tile_w_l * vs
    ov_h, ov_w = overlap_latent * vs, overlap_latent * vs

    accum = jnp.zeros((B, Hl, Wl, model.config.vae.z_channels), jnp.float32)
    count = jnp.zeros((B, Hl, Wl, 1), jnp.float32)

    # Enumerate tiles host-side (static); batch equal-shaped groups.
    for i in range(h_tiles):
        for j in range(w_tiles):
            hs, he = i * tile_h, (i + 1) * tile_h
            ws, we = j * tile_w, (j + 1) * tile_w
            hso, heo = max(hs - ov_h, 0), min(he + ov_h, H)
            wso, weo = max(ws - ov_w, 0), min(we + ov_w, W)
            tile = image[:, hso:heo, wso:weo]
            z = model.encode_video(tile[:, None], params=params)[:, 0]
            top = (hs - hso) // vs
            left = (ws - wso) // vs
            bot = z.shape[1] - (heo - he) // vs
            right = z.shape[2] - (weo - we) // vs
            zc = z[:, top:bot, left:right]
            accum = accum.at[:, i * tile_h_l : (i + 1) * tile_h_l, j * tile_w_l : (j + 1) * tile_w_l].add(zc)
            count = count.at[:, i * tile_h_l : (i + 1) * tile_h_l, j * tile_w_l : (j + 1) * tile_w_l].add(1.0)

    latent = accum / jnp.maximum(count, 1.0)
    return latent[:, None]  # [B, 1, Hl, Wl, zc]


def ring_aware_decode(
    model: LatentVideoDiffusion,
    latent: jnp.ndarray,  # [B, F, h, w, zc]
    halo_chunks: int = 16,
    frame_chunk: int = 1,
    w_tiles: int = 1,
    params=None,
) -> jnp.ndarray:
    """Decode a W-ring latent with wrap-around halo so the seam is
    continuous: pad width by w/halo_chunks on each side with wrapped
    content, decode, crop (i2v_sphere_panorama_pipeline.py:974-991).

    ``w_tiles > 1`` splits the width into ring tiles decoded separately
    (each with its own wrap halo) — one 4K-equirect frame exceeds HBM if
    decoded whole; 2-4 tiles fit.
    """
    B, F, h, w, zc = latent.shape
    halo = w // halo_chunks
    vs = model.config.vae.spatial_scale

    if w_tiles <= 1:
        padded = jnp.concatenate(
            [latent[:, :, :, -halo:], latent, latent[:, :, :, :halo]], axis=3
        )
        video = model.decode_video_chunked(padded, frame_chunk=frame_chunk, params=params)
        return video[:, :, :, halo * vs : -(halo * vs)]

    assert w % w_tiles == 0, (w, w_tiles)
    tw = w // w_tiles
    outs = []
    for ti in range(w_tiles):
        wi = (jnp.arange(tw + 2 * halo) + ti * tw - halo) % w
        tile = latent[:, :, :, wi]
        video = model.decode_video_chunked(tile, frame_chunk=frame_chunk, params=params)
        outs.append(video[:, :, :, halo * vs : -(halo * vs)])
    return jnp.concatenate(outs, axis=3)
