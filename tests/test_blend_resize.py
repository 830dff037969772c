"""Blend + resize ops vs torch oracles."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from dynamicscaler_tpu.ops.blend import mix_with_mask, normalize_accumulated
from dynamicscaler_tpu.ops.resize import resize_video_latent, pad_frames_front, pad_frames_end


def test_mix_with_mask_matches_reference_formula(rng):
    l1 = rng.standard_normal((1, 2, 4, 4, 3)).astype(np.float32)
    l2 = rng.standard_normal((1, 2, 4, 4, 3)).astype(np.float32)
    mask = (rng.random((1, 2, 4, 4, 1)) > 0.5).astype(np.float32)
    r = 0.3
    out = np.asarray(mix_with_mask(jnp.asarray(l1), jnp.asarray(l2), jnp.asarray(mask), r))
    mixed = l1 * (1 - r) + l2 * r
    ref = l1 * (1 - mask) + mixed * mask
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_mix_full_mask_ratio_one_replaces():
    l1 = jnp.ones((1, 1, 2, 2, 1))
    l2 = jnp.full((1, 1, 2, 2, 1), 5.0)
    out = mix_with_mask(l1, l2, jnp.ones_like(l1), 1.0)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_normalize_accumulated_fallback():
    accum = jnp.asarray([[4.0], [0.0]])
    count = jnp.asarray([[2.0], [0.0]])
    fb = jnp.asarray([[9.0], [7.0]])
    out = np.asarray(normalize_accumulated(accum, count, fb))
    np.testing.assert_allclose(out, [[2.0], [7.0]])


def _torch_resize(lat_bfhwc, th, tw, mode, align_corners):
    t = torch.from_numpy(lat_bfhwc.transpose(0, 1, 4, 2, 3))  # B F C H W
    B, F, C, H, W = t.shape
    t = t.reshape(B * F, C, H, W)
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    out = TF.interpolate(t, size=(th, tw), mode=mode, **kwargs)
    out = out.reshape(B, F, C, th, tw).permute(0, 1, 3, 4, 2)
    return out.numpy()


def test_resize_nearest_exact_decimation(rng):
    lat = rng.standard_normal((1, 2, 8, 16, 4)).astype(np.float32)
    out = np.asarray(resize_video_latent(jnp.asarray(lat), 4, 8, mode="nearest"))
    ref = _torch_resize(lat, 4, 8, "nearest", None)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_resize_bilinear_close_to_torch(rng):
    lat = rng.standard_normal((1, 2, 8, 16, 4)).astype(np.float32)
    out = np.asarray(resize_video_latent(jnp.asarray(lat), 16, 32, mode="bilinear"))
    ref = _torch_resize(lat, 16, 32, "bilinear", False)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_bicubic_close_to_torch(rng):
    lat = rng.standard_normal((1, 1, 8, 16, 2)).astype(np.float32)
    out = np.asarray(resize_video_latent(jnp.asarray(lat), 16, 32, mode="bicubic"))
    ref = _torch_resize(lat, 16, 32, "bicubic", False)
    # torch-matched Keys a=-0.75 kernel: full-array agreement
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pad_frames(rng):
    lat = rng.standard_normal((1, 3, 2, 2, 1)).astype(np.float32)
    out = np.asarray(pad_frames_front(jnp.asarray(lat), 2))
    assert out.shape[1] == 5
    np.testing.assert_array_equal(out[:, 0], lat[:, 0])
    np.testing.assert_array_equal(out[:, 1], lat[:, 0])
    out2 = np.asarray(pad_frames_end(jnp.asarray(lat), 1))
    np.testing.assert_array_equal(out2[:, -1], lat[:, -1])
