"""Equirectangular sphere <-> perspective view projection.

TPU-native redesign of the reference's ``PanoramaTensor`` /
``RingPanoramaTensor`` (utils/panorama_tensor_utils.py:5-246,
utils/ring_panorama_tensor_utils.py:8-260):

* The pinhole->sphere ray cast (``_get_uv``,
  utils/panorama_tensor_utils.py:204-245) runs **on host in numpy** — for a
  sampling run, the set of (fov, theta, phi) view phases is finite and known
  up front (theta offsets cycle with ``loop_step_theta``), so every (u, v)
  grid / index map is a precomputed constant shipped into the jitted step.
* View extraction is a single XLA gather of precomputed linear indices;
  view scatter is an XLA scatter (`.at[idx].set/.add`) — no `grid_sample`,
  no `index_add_` atomics.
* Frame-axis ring windows (RingPanoramaTensor) compose the spatial maps with
  modular frame indices from :mod:`dynamicscaler_tpu.ops.ring`.

Pano layout: ``[B, F, H, W, C]`` with ``W == 2 * H`` (equirect).
View layout: ``[B, F, h, w, C]``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from dynamicscaler_tpu.ops.ring import wrap_slice_indices


# ---------------------------------------------------------------------------
# Host-side geometry (numpy float32, bit-matching the reference's torch math)
# ---------------------------------------------------------------------------


def uv_grid(
    fov: float,
    theta: float,
    phi: float,
    view_width: int,
    view_height: int,
    pano_height: int,
    pano_width: int,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel-space (u, v) sample coordinates into the equirect pano for each
    view pixel. Mirrors utils/panorama_tensor_utils.py:204-245.

    Returns float arrays of shape ``[view_height, view_width]`` with
    ``u in [0, W-1]`` (after longitude wrap) and ``v in [0, H-1]``.
    """
    fov_rad = np.deg2rad(np.asarray(fov, dtype=dtype))
    theta_rad = np.deg2rad(np.asarray(theta, dtype=dtype))
    phi_rad = np.deg2rad(np.asarray(phi, dtype=dtype))

    f = 0.5 * view_width / np.tan(fov_rad / 2)

    x = np.linspace(-view_width / 2, view_width / 2 - 1, view_width, dtype=dtype)
    y = np.linspace(-view_height / 2, view_height / 2 - 1, view_height, dtype=dtype)
    yv, xv = np.meshgrid(y, x, indexing="ij")
    zv = np.full_like(xv, f)
    xyz = np.stack([xv, yv, zv], axis=-1)
    xyz = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)

    cp, sp = np.cos(phi_rad), np.sin(phi_rad)
    ct, st = np.cos(theta_rad), np.sin(theta_rad)
    r_phi = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], dtype=dtype)
    r_theta = np.array([[ct, 0, st], [0, 1, 0], [-st, 0, ct]], dtype=dtype)
    rot = (r_theta @ r_phi).astype(dtype)

    xyz_rot = xyz.reshape(-1, 3) @ rot.T
    xyz_rot = xyz_rot.reshape(view_height, view_width, 3)
    lon = np.arctan2(xyz_rot[..., 0], xyz_rot[..., 2])
    lat = np.arcsin(np.clip(xyz_rot[..., 1], -1.0, 1.0))
    lon = (lon + 2 * np.pi) % (2 * np.pi)
    u = lon / (2 * np.pi) * (pano_width - 1)
    v = (lat + np.pi / 2) / np.pi * (pano_height - 1)
    return u.astype(dtype), v.astype(dtype)


@dataclasses.dataclass(frozen=True)
class SphereView:
    """Precomputed projection maps for one (fov, theta, phi) view."""

    fov: float
    theta: float
    phi: float
    view_height: int
    view_width: int
    pano_height: int
    pano_width: int
    u: np.ndarray  # [h, w] float32 pixel coords
    v: np.ndarray  # [h, w] float32
    # nearest (floor) sampling, longitude-wrapped / latitude-clamped:
    gather_idx: np.ndarray  # [h, w] int32 linear index v*W + u into pano
    # nearest scatter, invalid pixels marked with index H*W (dropped):
    scatter_idx: np.ndarray  # [h, w] int32
    valid: np.ndarray  # [h, w] bool


def make_sphere_view(
    fov: float,
    theta: float,
    phi: float,
    view_height: int,
    view_width: int,
    pano_height: int,
    pano_width: int,
) -> SphereView:
    """Build the static index maps for one view direction."""
    u, v = uv_grid(fov, theta, phi, view_width, view_height, pano_height, pano_width)
    W, H = pano_width, pano_height

    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)

    # get: wrap longitude, clamp latitude (panorama_tensor_utils.py:185-202)
    gu = u0 % W
    gv = np.clip(v0, 0, H - 1)
    gather_idx = (gv * W + gu).astype(np.int32)

    # validity (panorama_tensor_utils.py:170,197): float coords in range
    valid = (u >= 0) & (u < W) & (v >= 0) & (v < H)

    # set: floor indices, invalid dropped (panorama_tensor_utils.py:154-183).
    # Sentinel is H*W (one past the end), NOT -1: jax scatter with
    # mode='drop' only drops out-of-bounds indices, while negative indices
    # wrap python-style — a -1 sentinel would scatter every invalid view
    # pixel onto the last pano pixel.
    sidx = (v0 * W + u0).astype(np.int64)
    sidx = np.where(valid & (u0 >= 0) & (u0 < W) & (v0 >= 0) & (v0 < H), sidx, H * W)
    scatter_idx = sidx.astype(np.int32)

    return SphereView(
        fov=fov,
        theta=theta,
        phi=phi,
        view_height=view_height,
        view_width=view_width,
        pano_height=pano_height,
        pano_width=pano_width,
        u=u,
        v=v,
        gather_idx=gather_idx,
        scatter_idx=scatter_idx,
        valid=valid,
    )


# ---------------------------------------------------------------------------
# Device-side gather / scatter (jit-safe; index maps are jnp arrays)
# ---------------------------------------------------------------------------


def get_view_nearest(
    pano: jnp.ndarray,
    gather_idx: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    frame_origin=None,
    frame_count: Optional[int] = None,
) -> jnp.ndarray:
    """Nearest-neighbor view extraction (one gather).

    Args:
      pano: ``[B, F, H, W, C]`` equirect tensor.
      gather_idx: ``[h, w]`` int linear indices (from :class:`SphereView`).
      valid: optional ``[h, w]`` bool; invalid view pixels are zeroed
        (panorama_tensor_utils.py:200).
      frame_origin/frame_count: optional ring frame window (wrap-around),
        matching RingPanoramaTensor (ring_panorama_tensor_utils.py:35-60).

    Returns ``[B, F', h, w, C]`` where F' = frame_count or F.
    """
    B, F, H, W, C = pano.shape
    if frame_origin is not None:
        fi = wrap_slice_indices(frame_origin, frame_count, F)
        pano = pano[:, fi]
    flat = pano.reshape(pano.shape[0], pano.shape[1], H * W, C)
    view = flat[:, :, gather_idx.reshape(-1), :]
    h, w = gather_idx.shape
    view = view.reshape(pano.shape[0], pano.shape[1], h, w, C)
    if valid is not None:
        view = view * valid[None, None, :, :, None].astype(view.dtype)
    return view


def get_view_bilinear(
    pano: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear view extraction with border clamp, equivalent to the
    reference's ``F.grid_sample(..., padding_mode='border',
    align_corners=True)`` at pixel coords (panorama_tensor_utils.py:28-51).

    pano: ``[B, F, H, W, C]``; u, v: ``[h, w]`` float pixel coords.
    """
    B, F, H, W, C = pano.shape
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.clip(u0 + 1, 0, W - 1)
    v1 = jnp.clip(v0 + 1, 0, H - 1)
    du = (u - u0).astype(pano.dtype)[None, None, :, :, None]
    dv = (v - v0).astype(pano.dtype)[None, None, :, :, None]

    flat = pano.reshape(B, F, H * W, C)

    def g(vi, ui):
        idx = (vi * W + ui).reshape(-1)
        h, w = u.shape
        return flat[:, :, idx, :].reshape(B, F, h, w, C)

    p00 = g(v0, u0)
    p01 = g(v1, u0)
    p10 = g(v0, u1)
    p11 = g(v1, u1)
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * (1 - du) * dv
        + p10 * du * (1 - dv)
        + p11 * du * dv
    )


def set_view_nearest(
    pano: jnp.ndarray,
    view: jnp.ndarray,
    scatter_idx: jnp.ndarray,
    frame_origin=None,
) -> jnp.ndarray:
    """Nearest scatter of a view back onto the pano (last-write-wins on
    duplicate targets, invalid pixels dropped via index H*W + mode='drop').
    Matches set_view_tensor_no_interpolation
    (panorama_tensor_utils.py:154-183).

    view: ``[B, F', h, w, C]``; if ``frame_origin`` given, writes wrap into
    the pano frame ring (ring_panorama_tensor_utils.py:86-144).
    """
    B, F, H, W, C = pano.shape
    Bv, Fv, h, w, Cv = view.shape
    flat_idx = scatter_idx.reshape(-1)
    view_flat = view.reshape(Bv, Fv, h * w, C)

    if frame_origin is None:
        assert Fv == F
        flat = pano.reshape(B, F, H * W, C)
        flat = flat.at[:, :, flat_idx, :].set(view_flat, mode="drop")
        return flat.reshape(B, F, H, W, C)

    fi = wrap_slice_indices(frame_origin, Fv, F)
    flat = pano.reshape(B, F, H * W, C)
    flat = flat.at[:, fi[:, None], flat_idx[None, :], :].set(view_flat, mode="drop")
    return flat.reshape(B, F, H, W, C)


def add_view_nearest(
    pano_accum: jnp.ndarray,
    count_accum: jnp.ndarray,
    view: jnp.ndarray,
    scatter_idx: jnp.ndarray,
    frame_origin=None,
    weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulating variant of :func:`set_view_nearest` for commutative
    (order-independent) parallel window blending: scatter-add values and
    counts; normalize later with
    :func:`dynamicscaler_tpu.ops.blend.normalize_accumulated`.

    ``count_accum`` has shape ``[B, F, H, W, 1]``. Optional ``weight``
    ([h, w]) gives per-pixel blend weights (e.g. feathered window edges).
    """
    B, F, H, W, C = pano_accum.shape
    Bv, Fv, h, w, Cv = view.shape
    flat_idx = scatter_idx.reshape(-1)
    if weight is None:
        wflat = jnp.ones((h * w,), pano_accum.dtype)
    else:
        wflat = weight.reshape(-1).astype(pano_accum.dtype)
    view_flat = view.reshape(Bv, Fv, h * w, C) * wflat[None, None, :, None]

    pflat = pano_accum.reshape(B, F, H * W, C)
    cflat = count_accum.reshape(B, F, H * W, 1)
    if frame_origin is None:
        assert Fv == F
        pflat = pflat.at[:, :, flat_idx, :].add(view_flat, mode="drop")
        cflat = cflat.at[:, :, flat_idx, :].add(
            wflat[None, None, :, None], mode="drop"
        )
    else:
        fi = wrap_slice_indices(frame_origin, Fv, F)
        pflat = pflat.at[:, fi[:, None], flat_idx[None, :], :].add(view_flat, mode="drop")
        cflat = cflat.at[:, fi[:, None], flat_idx[None, :], :].add(
            jnp.broadcast_to(wflat[None, None, :, None], (B, Fv, h * w, 1)), mode="drop"
        )
    return pflat.reshape(B, F, H, W, C), cflat.reshape(B, F, H, W, 1)


def add_view_bilinear(
    pano_accum: jnp.ndarray,
    weight_accum: jnp.ndarray,
    view: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear splat (4-corner weighted scatter-add) of a view onto the
    pano, longitude-wrapped / latitude-clamped. Equivalent of the
    reference's ``set_view_tensor_bilinear`` ``index_add_`` accumulation
    (panorama_tensor_utils.py:98-152) as XLA scatter-adds.
    """
    B, F, H, W, C = pano_accum.shape
    Bv, Fv, h, w, Cv = view.shape
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = (u0 + 1) % W
    v1 = jnp.clip(v0 + 1, 0, H - 1)
    du = (u - u0).astype(pano_accum.dtype)
    dv = (v - v0).astype(pano_accum.dtype)

    corners = [
        (v0, u0, (1 - du) * (1 - dv)),
        (v1, u0, (1 - du) * dv),
        (v0, u1, du * (1 - dv)),
        (v1, u1, du * dv),
    ]
    pflat = pano_accum.reshape(B, F, H * W, C)
    wfl = weight_accum.reshape(B, F, H * W, 1)
    vflat = view.reshape(Bv, Fv, h * w, C)
    for vi, ui, wgt in corners:
        # v clamps at the poles, u wraps around the ring
        # (panorama_tensor_utils.py:98-152 splat semantics)
        idx = jnp.clip(vi, 0, H - 1) * W + (ui % W)
        idx = idx.reshape(-1)
        wg = wgt.reshape(-1)
        pflat = pflat.at[:, :, idx, :].add(vflat * wg[None, None, :, None])
        wfl = wfl.at[:, :, idx, :].add(
            jnp.broadcast_to(wg[None, None, :, None], (B, Fv, h * w, 1))
        )
    return pflat.reshape(B, F, H, W, C), wfl.reshape(B, F, H, W, 1)


def make_sphere_views(
    specs: Sequence[Tuple[float, float, float]],  # (fov, theta, phi)
    view_height: int,
    view_width: int,
    pano_height: int,
    pano_width: int,
) -> list:
    """Build index maps for many views.

    Implementation note: a fully vectorized [N, h, w, 3] raycast was
    measured 2-10x SLOWER than this per-view loop at image resolutions
    (numpy temporary-array thrash); the whole 440-view stage-1 setup costs
    ~4s per-view, so the loop stays.
    """
    return [
        make_sphere_view(f, t, p, view_height, view_width, pano_height, pano_width)
        for (f, t, p) in specs
    ]


def stack_views(views: Sequence[SphereView]):
    """Stack per-view index maps into batched jnp arrays for vmapped
    multi-view gather/scatter inside one jitted step."""
    gather = jnp.asarray(np.stack([v.gather_idx for v in views]))
    scatter = jnp.asarray(np.stack([v.scatter_idx for v in views]))
    valid = jnp.asarray(np.stack([v.valid for v in views]))
    return gather, scatter, valid
