"""Sphere projection vs a torch oracle implementing the same published
equirect<->pinhole equations (independent re-derivation of
utils/panorama_tensor_utils.py math)."""

import numpy as np
import torch
import jax.numpy as jnp

from dynamicscaler_tpu.ops.sphere import (
    uv_grid,
    make_sphere_view,
    get_view_nearest,
    get_view_bilinear,
    set_view_nearest,
    add_view_nearest,
)
from dynamicscaler_tpu.ops.blend import normalize_accumulated


def torch_uv(fov, theta, phi, width, height, W, H):
    dtype = torch.float32
    fov_r = torch.deg2rad(torch.tensor(fov, dtype=dtype))
    th_r = torch.deg2rad(torch.tensor(theta, dtype=dtype))
    ph_r = torch.deg2rad(torch.tensor(phi, dtype=dtype))
    f = 0.5 * width / torch.tan(fov_r / 2)
    x = torch.linspace(-width / 2, width / 2 - 1, width, dtype=dtype)
    y = torch.linspace(-height / 2, height / 2 - 1, height, dtype=dtype)
    yv, xv = torch.meshgrid(y, x, indexing="ij")
    zv = torch.full_like(xv, f)
    xyz = torch.stack([xv, yv, zv], -1)
    xyz = xyz / xyz.norm(dim=-1, keepdim=True)
    R_phi = torch.tensor(
        [[1, 0, 0], [0, torch.cos(ph_r), -torch.sin(ph_r)], [0, torch.sin(ph_r), torch.cos(ph_r)]],
        dtype=dtype,
    )
    R_th = torch.tensor(
        [[torch.cos(th_r), 0, torch.sin(th_r)], [0, 1, 0], [-torch.sin(th_r), 0, torch.cos(th_r)]],
        dtype=dtype,
    )
    R = R_th @ R_phi
    rot = (xyz.view(-1, 3) @ R.t()).view(height, width, 3)
    lon = torch.atan2(rot[..., 0], rot[..., 2])
    lat = torch.asin(rot[..., 1])
    lon = (lon + 2 * torch.pi) % (2 * torch.pi)
    u = lon / (2 * torch.pi) * (W - 1)
    v = (lat + torch.pi / 2) / torch.pi * (H - 1)
    return u.numpy(), v.numpy()


def test_uv_grid_matches_torch_oracle():
    for fov, theta, phi in [(90, 0, 0), (90, 60, -67.5), (110, 30, 22.5)]:
        u, v = uv_grid(fov, theta, phi, 64, 40, 64, 128)
        tu, tv = torch_uv(fov, theta, phi, 64, 40, 128, 64)
        np.testing.assert_allclose(u, tu, atol=2e-3)
        np.testing.assert_allclose(v, tv, atol=2e-3)


def test_view_get_set_roundtrip_center(rng):
    """Pixels extracted at view center re-scatter to the same locations."""
    H, W = 32, 64
    pano = rng.standard_normal((1, 2, H, W, 3)).astype(np.float32)
    view = make_sphere_view(90, 45, 0, 20, 24, H, W)
    got = get_view_nearest(jnp.asarray(pano), jnp.asarray(view.gather_idx), jnp.asarray(view.valid))
    assert got.shape == (1, 2, 20, 24, 3)

    # scattering the extracted view back writes identical values
    out = set_view_nearest(jnp.asarray(pano), got, jnp.asarray(view.scatter_idx))
    touched = np.unique(view.scatter_idx[view.scatter_idx >= 0])
    flat_in = pano.reshape(1, 2, H * W, 3)
    flat_out = np.asarray(out).reshape(1, 2, H * W, 3)
    # untouched pixels unchanged
    untouched = np.setdiff1d(np.arange(H * W), touched)
    np.testing.assert_array_equal(flat_out[:, :, untouched], flat_in[:, :, untouched])


def test_gather_nearest_matches_manual(rng):
    H, W = 16, 32
    pano = rng.standard_normal((1, 1, H, W, 2)).astype(np.float32)
    view = make_sphere_view(100, 120, 30, 10, 12, H, W)
    got = np.asarray(
        get_view_nearest(jnp.asarray(pano), jnp.asarray(view.gather_idx), jnp.asarray(view.valid))
    )
    u0 = np.floor(view.u).astype(int) % W
    v0 = np.clip(np.floor(view.v).astype(int), 0, H - 1)
    ref = pano[0, 0][v0, u0]  # [h, w, C]
    ref = ref * view.valid[..., None]
    np.testing.assert_array_equal(got[0, 0], ref.astype(np.float32))


def test_bilinear_view_matches_grid_sample(rng):
    H, W = 16, 32
    pano = rng.standard_normal((1, 1, H, W, 2)).astype(np.float32)
    u, v = uv_grid(90, 15, -30, 12, 10, H, W)
    got = np.asarray(get_view_bilinear(jnp.asarray(pano), jnp.asarray(u), jnp.asarray(v)))

    t_pano = torch.from_numpy(pano[0].transpose(0, 3, 1, 2))  # [1, C, H, W]
    gu = torch.from_numpy(u / (W - 1) * 2 - 1)
    gv = torch.from_numpy(v / (H - 1) * 2 - 1)
    grid = torch.stack([gu, gv], dim=-1).unsqueeze(0)
    ref = torch.nn.functional.grid_sample(
        t_pano, grid, mode="bilinear", padding_mode="border", align_corners=True
    )
    np.testing.assert_allclose(got[0, 0], ref[0].permute(1, 2, 0).numpy(), atol=1e-4)


def test_add_view_average_two_views(rng):
    """Two overlapping views scatter-add then normalize == mean in overlap."""
    H, W = 16, 32
    accum = jnp.zeros((1, 1, H, W, 1))
    count = jnp.zeros((1, 1, H, W, 1))
    v1 = make_sphere_view(90, 0, 0, 8, 8, H, W)
    v2 = make_sphere_view(90, 45, 0, 8, 8, H, W)
    ones = jnp.ones((1, 1, 8, 8, 1))
    accum, count = add_view_nearest(accum, count, ones * 2.0, jnp.asarray(v1.scatter_idx))
    accum, count = add_view_nearest(accum, count, ones * 4.0, jnp.asarray(v2.scatter_idx))
    out = np.asarray(normalize_accumulated(accum, count))
    c = np.asarray(count)
    # pixels hit twice average to 3 (if hit once by each view)
    flat_o, flat_c = out.reshape(-1), c.reshape(-1)
    s1 = set(np.unique(v1.scatter_idx[v1.scatter_idx >= 0]))
    s2 = set(np.unique(v2.scatter_idx[v2.scatter_idx >= 0]))
    both = s1 & s2
    # overlap exists for adjacent 45-degree views at fov 90
    assert both
    # note: duplicate view pixels can hit the same pano pixel twice from one
    # view; only assert pixels whose total count is exactly 2 with one hit each
    for idx in list(both)[:50]:
        if flat_c[idx] == 2.0:
            np.testing.assert_allclose(flat_o[idx], 3.0, rtol=1e-6)


def test_frame_ring_view_window(rng):
    """Frame window with wrap-around (RingPanoramaTensor semantics)."""
    H, W = 8, 16
    F = 6
    pano = rng.standard_normal((1, F, H, W, 1)).astype(np.float32)
    view = make_sphere_view(90, 0, 0, 4, 4, H, W)
    got = np.asarray(
        get_view_nearest(
            jnp.asarray(pano), jnp.asarray(view.gather_idx), jnp.asarray(view.valid),
            frame_origin=4, frame_count=4,
        )
    )
    full = np.asarray(
        get_view_nearest(jnp.asarray(pano), jnp.asarray(view.gather_idx), jnp.asarray(view.valid))
    )
    np.testing.assert_array_equal(got[:, 0], full[:, 4])
    np.testing.assert_array_equal(got[:, 2], full[:, 0])


def test_make_sphere_views_batch_matches_single():
    from dynamicscaler_tpu.ops.sphere import make_sphere_views

    specs = [(90.0, 0.0, 0.0), (110.0, 60.0, -45.0), (120.0, 270.0, 67.5)]
    batch = make_sphere_views(specs, 10, 12, 16, 32)
    for spec, bv in zip(specs, batch):
        sv = make_sphere_view(spec[0], spec[1], spec[2], 10, 12, 16, 32)
        np.testing.assert_allclose(bv.u, sv.u, atol=2e-3)
        np.testing.assert_allclose(bv.v, sv.v, atol=2e-3)
        np.testing.assert_array_equal(bv.gather_idx, sv.gather_idx)
        np.testing.assert_array_equal(bv.scatter_idx, sv.scatter_idx)
        np.testing.assert_array_equal(bv.valid, sv.valid)
