"""End-to-end pipeline tests on the tiny model (CPU).

These are behavioral gates, not numerics (random weights): shapes, finiteness,
determinism under fixed keys, overlap-mode semantics, engine equivalences.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.pipelines import i2v, sphere, t2v
from dynamicscaler_tpu.pipelines.planar import earlier_coverage_masks
from dynamicscaler_tpu.pipelines.tiled_vae import ring_aware_decode, tiled_vae_encode


@pytest.fixture(scope="module")
def t2v_model():
    return LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )


@pytest.fixture(scope="module")
def i2v_model():
    return LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=True), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )


def test_basic_sample_deterministic(t2v_model):
    kwargs = dict(height=32, width=32, frames=4, num_inference_steps=3,
                  key=jax.random.PRNGKey(7), decode=False)
    _, d1 = t2v.basic_sample(t2v_model, "a swan", **kwargs)
    _, d2 = t2v.basic_sample(t2v_model, "a swan", **kwargs)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # NOTE: prompt sensitivity cannot be asserted at random init — the
    # spatial transformers' proj_out layers are zero-init (matching the
    # reference), so context contributes exactly 0 until real weights load.
    kwargs["key"] = jax.random.PRNGKey(8)
    _, d3 = t2v.basic_sample(t2v_model, "a swan", **kwargs)
    assert np.abs(np.asarray(d1) - np.asarray(d3)).max() > 0


def test_shift_windows_covers_everything(t2v_model):
    """Every latent position must be written by the final step (no stale
    noise regions)."""
    _, den = t2v.sample_shift_multi_windows(
        t2v_model, "x", num_windows_w=2, num_windows_h=2, height=32, width=32,
        frames=4, num_inference_steps=2, loop_step=2, decode=False,
        key=jax.random.PRNGKey(1),
    )
    assert den.shape == (1, 4, 32, 32, 4)
    # denoised buffer starts at zero; all positions must have been scattered
    assert float(jnp.min(jnp.abs(den))) >= 0  # trivially true
    assert not bool(jnp.any(jnp.all(den == 0, axis=(0, 1, 4))))


def test_earlier_coverage_masks_semantics():
    origins = [(0, 0, 0), (0, 0, 4), (0, 0, 8)]
    masks = earlier_coverage_masks(origins, (2, 4, 8), (2, 4, 12))
    # window 0 sees nothing covered
    assert masks[0].sum() == 0
    # window 1 at w=4 overlaps window 0 on w=[4,8) -> first 4 of its 8 cols
    np.testing.assert_array_equal(masks[1][..., 0][:, :, :4], 1.0)
    np.testing.assert_array_equal(masks[1][..., 0][:, :, 4:], 0.0)
    # window 2 at w=8 wraps to [8,12)+[0,4): overlaps w0 on [0,4) (its cols 4:)
    np.testing.assert_array_equal(masks[2][..., 0][:, :, 4:], 1.0)
    # and its cols 0:4 map to w=[8,12): covered by window 1 ([4,12))
    np.testing.assert_array_equal(masks[2][..., 0][:, :, :4], 1.0)


def test_i2v_planar_shapes_and_finite(i2v_model):
    pano = np.zeros((32, 64, 3), np.float32)
    video, den = i2v.sample_shift_multi_windows(
        i2v_model, "pano", pano, total_w=64, total_h=32, total_f=4,
        num_windows_w=4, num_windows_h=2, loop_step=2,
        height=16, width=16, frames=4, num_inference_steps=3,
        key=jax.random.PRNGKey(3),
    )
    assert video.shape == (1, 4, 32, 64, 3)
    assert bool(jnp.isfinite(video).all())


def test_sphere_pipeline_paste_on_static(i2v_model):
    pano = np.zeros((32, 64, 3), np.float32)
    grid = {0.0: [0.0, 120.0, 240.0], 60.0: [0.0, 180.0], -60.0: [0.0, 180.0]}
    _, lat, den = sphere.sample_shift_sphere_panorama(
        i2v_model, "ocean", pano, equirect_width=64, equirect_height=32,
        phi_theta_dict=grid, view_fov=110, loop_step_theta=2,
        total_f=4, height=16, width=16, frames=4, num_inference_steps=3,
        paste_on_static=True, key=jax.random.PRNGKey(4),
    )
    assert lat.shape == (1, 4, 16, 32, 4)
    assert bool(jnp.isfinite(lat).all()) and bool(jnp.isfinite(den).all())


def test_tiled_vae_encode_matches_direct(i2v_model):
    """Tiled encode with large overlap == direct encode (same conv field)."""
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((32, 64, 3)).astype(np.float32) * 0.2
    )
    direct = i2v_model.encode_video(img[None, None])
    tiled = tiled_vae_encode(i2v_model, img, h_tiles=2, w_tiles=2, overlap_latent=8)
    # per-tile GroupNorm statistics make tiled != direct (inherent, true of
    # the reference too); require high agreement, not bit equality
    d, t = np.asarray(direct)[0, 0], np.asarray(tiled)[0, 0]
    corr = np.corrcoef(d.ravel(), t.ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(d - t).mean() < 0.05


def test_ring_aware_decode_shape(i2v_model):
    lat = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 2, 16, 32, 4)).astype(np.float32)
    )
    video = ring_aware_decode(i2v_model, lat, halo_chunks=16)
    assert video.shape == (1, 2, 32, 64, 3)


def test_ring_decode_seam_continuity(i2v_model):
    """Rolling the ring latent by half must commute with decode away from
    borders — the wrap-padded decode treats W as a true ring."""
    lat = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 1, 16, 32, 4)).astype(np.float32)
    )
    v1 = np.asarray(ring_aware_decode(i2v_model, lat, halo_chunks=16))
    v2 = np.asarray(ring_aware_decode(i2v_model, jnp.roll(lat, 16, axis=3), halo_chunks=16))
    # decode is not exactly shift-equivariant (whole-frame GroupNorm stats +
    # global VAE mid-attention see different halo content); require the
    # fields to agree closely on average
    d = np.abs(np.roll(v1, 32, axis=3) - v2)
    assert d.mean() < 0.02, d.mean()
    assert np.corrcoef(np.roll(v1, 32, axis=3).ravel(), v2.ravel())[0, 1] > 0.99


def test_fifo_streaming(t2v_model):
    from dynamicscaler_tpu.pipelines.fifo import fifo_sample

    _, lat = fifo_sample(
        t2v_model, "stream", num_output_frames=6, height=32, width=32,
        frames=4, key=jax.random.PRNGKey(9), decode=False,
    )
    assert lat.shape == (1, 6, 16, 16, 4)
    assert bool(jnp.isfinite(lat).all())
    # deterministic under the same key
    _, lat2 = fifo_sample(
        t2v_model, "stream", num_output_frames=6, height=32, width=32,
        frames=4, key=jax.random.PRNGKey(9), decode=False,
    )
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))


def test_fifo_streaming_lcm(t2v_model):
    """The LCM / T2V-Turbo FIFO stream (d_scheduler.py fifo_step semantics,
    oracle-tested in test_lcm.py) runs end to end."""
    from dynamicscaler_tpu.pipelines.fifo import fifo_sample

    _, lat = fifo_sample(
        t2v_model, "stream", num_output_frames=5, height=32, width=32,
        frames=4, key=jax.random.PRNGKey(9), decode=False, scheduler="lcm",
    )
    assert lat.shape == (1, 5, 16, 16, 4)
    assert bool(jnp.isfinite(lat).all())
    _, lat2 = fifo_sample(
        t2v_model, "stream", num_output_frames=5, height=32, width=32,
        frames=4, key=jax.random.PRNGKey(9), decode=False, scheduler="lcm",
    )
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))


def test_i2v_integer_grid_with_dock(i2v_model):
    pano = np.zeros((32, 64, 3), np.float32)
    video, den = i2v.sample_shift_multi_windows_integer(
        i2v_model, "x", pano, num_windows_w=4, num_windows_h=2,
        loop_step=2, height=16, width=16, frames=4,
        num_inference_steps=3, dock_at_h=True, key=jax.random.PRNGKey(11),
    )
    assert den.shape == (1, 4, 16, 32, 4)
    assert bool(jnp.isfinite(video).all())


def test_t2v_sphere_text_only_with_fov(t2v_model):
    pano = np.zeros((32, 64, 3), np.float32)
    _, lat, den = sphere.sample_shift_sphere_panorama(
        t2v_model, "x", pano, equirect_width=64, equirect_height=32,
        phi_theta_dict={0.0: [0.0, 180.0], 60.0: [0.0]}, view_fov=110,
        loop_step_theta=2, phi_fov_dict={60.0: 140.0},
        total_f=4, height=16, width=16, frames=4, num_inference_steps=2,
        paste_on_static=False, use_image_cond=False,
        key=jax.random.PRNGKey(12),
    )
    assert bool(jnp.isfinite(lat).all())


def test_ring_decode_w_tiles_matches_whole(i2v_model):
    """Tiled ring decode == whole decode away from GN-stat noise."""
    lat = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 1, 16, 32, 4)).astype(np.float32)
    )
    whole = np.asarray(ring_aware_decode(i2v_model, lat, halo_chunks=16))
    tiled = np.asarray(ring_aware_decode(i2v_model, lat, halo_chunks=16, w_tiles=2))
    assert tiled.shape == whole.shape
    # per-tile GroupNorm statistics shift values slightly (same caveat as
    # tiled encode); correlation is the meaningful check
    d = np.abs(whole - tiled)
    assert d.mean() < 0.05, d.mean()
    assert np.corrcoef(whole.ravel(), tiled.ravel())[0, 1] > 0.99


def test_device_masks_match_host_planar():
    """On-device earlier-coverage masks (generated inside the jitted step)
    must equal the host-numpy oracle for wrapping, overlapping windows."""
    from dynamicscaler_tpu.pipelines.planar import device_earlier_masks

    origins = [(0, 0, 0), (1, 2, 8), (0, 2, 10), (1, 0, 4)]
    sizes = (2, 4, 8)
    dims = (2, 4, 12)
    host = earlier_coverage_masks(origins, sizes, dims)
    lat = jnp.zeros((1,) + dims + (4,))
    dev = jax.jit(lambda o: device_earlier_masks(o, sizes, lat))(
        jnp.asarray(origins, jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_device_masks_match_host_sphere():
    """On-device sphere coverage masks == host oracle, including views with
    invalid (out-of-pano) pixels and frame ring windows."""
    from dynamicscaler_tpu.ops.sphere import make_sphere_view
    from dynamicscaler_tpu.pipelines.sphere import (
        device_sphere_masks,
        sphere_earlier_masks,
    )

    H, W = 16, 32
    views = [make_sphere_view(fov, th, ph, 6, 8, H, W)
             for (fov, th, ph) in [(120, 0, 0), (120, 90, 0), (120, 0, 45)]]
    scatter = np.stack([v.scatter_idx for v in views])
    gather = np.stack([v.gather_idx for v in views])
    valid = np.stack([v.valid for v in views])
    f_origins = [0, 3]
    frames, total_f = 2, 4
    Nv = len(views)
    pair_view = np.asarray([v for _ in f_origins for v in range(Nv)], np.int32)
    pair_f = np.asarray([f0 for f0 in f_origins for _ in range(Nv)], np.int32)

    host = sphere_earlier_masks(
        scatter, f_origins, frames, total_f, H * W,
        gather_idx=gather, gather_valid=valid,
    )
    dev = jax.jit(
        lambda pv, pf: device_sphere_masks(
            jnp.asarray(gather), jnp.asarray(valid.astype(np.float32)),
            jnp.asarray(scatter), pv, pf, frames, total_f, H * W,
        )
    )(jnp.asarray(pair_view), jnp.asarray(pair_f))
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_scatter_sentinel_drops_invalid_pixels():
    """Invalid view pixels must not write anywhere (the reference masks
    them, panorama_tensor_utils.py:154-183). Regression: a -1 sentinel
    under jax mode='drop' WRAPS onto the last pano pixel; the sentinel is
    H*W (out of bounds), which mode='drop' actually drops. Views built by
    make_sphere_view are currently always fully valid (longitude wraps,
    latitude clamps), so this exercises the sentinel synthetically."""
    from dynamicscaler_tpu.ops.sphere import set_view_nearest

    H, W = 4, 6
    sidx = np.full((2, 3), H * W, np.int32)  # all invalid
    sidx[0, 0], sidx[1, 2] = 5, 17
    pano = jnp.zeros((1, 1, H, W, 1))
    out = np.asarray(
        set_view_nearest(pano, jnp.ones((1, 1, 2, 3, 1)), jnp.asarray(sidx))
    ).reshape(-1)
    expect = np.zeros(H * W)
    expect[[5, 17]] = 1.0
    np.testing.assert_array_equal(out, expect)
    # the last pano pixel (the -1 wrap target) stays untouched
    assert out[-1] == 0.0


def test_uncond_zero_embed(t2v_model):
    """uncond_type='zero_embed' (scripts/evaluation/funcs.py:24-27) returns
    context-shaped zeros; 'empty_seq' stays the default."""
    from dynamicscaler_tpu.pipelines.conditioning import build_uncond_context

    ctx = t2v_model.encode_text(["a swan"])
    uc = build_uncond_context(
        t2v_model, uncond_type="zero_embed", cond_like=ctx
    )
    assert uc.shape == ctx.shape
    assert float(jnp.abs(uc).max()) == 0.0
    uc2 = build_uncond_context(t2v_model, with_image=False)
    assert uc2.shape == ctx.shape
    assert float(jnp.abs(uc2).max()) > 0.0
