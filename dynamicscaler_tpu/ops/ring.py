"""Ring (toroidal wrap-around) window gather / scatter on video latents.

TPU-native redesign of the reference's ``RingLatent``
(utils/shift_window_utils.py:40-207). The reference assembles each window
from up to 3 contiguous torch slices per axis (27 concat pieces); here a
window is one XLA gather with modular indices and a scatter-back with the
same indices — static window shapes, traced window origins, fully
jit/vmap-compatible so whole window *batches* compile into a single program.

Canonical latent layout: ``[B, F, H, W, C]`` (frame/space axes 1, 2, 3).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def wrap_slice_indices(start, size: int, dim: int) -> jnp.ndarray:
    """Indices ``[start, start+size) mod dim``. `size` and `dim` are static;
    `start` may be a traced scalar."""
    return (jnp.asarray(start) + jnp.arange(size)) % dim


def get_ring_window(
    latent: jnp.ndarray,
    origin: Tuple,
    sizes: Tuple[int, int, int],
) -> jnp.ndarray:
    """Extract a wrap-around window.

    Args:
      latent: ``[B, F, H, W, C]``.
      origin: ``(f0, h0, w0)`` window start (ints or traced scalars).
      sizes: static ``(fs, hs, ws)`` window extents (each may exceed the
        latent extent up to 2x, matching shift_window_utils.py:73-75).

    Returns ``[B, fs, hs, ws, C]``.
    """
    B, F, H, W, C = latent.shape
    f0, h0, w0 = origin
    fs, hs, ws = sizes
    fi = wrap_slice_indices(f0, fs, F)
    hi = wrap_slice_indices(h0, hs, H)
    wi = wrap_slice_indices(w0, ws, W)
    # One gather over the three windowed axes.
    return latent[:, fi[:, None, None], hi[None, :, None], wi[None, None, :], :]


def set_ring_window(
    latent: jnp.ndarray,
    window: jnp.ndarray,
    origin: Tuple,
) -> jnp.ndarray:
    """Write a window back with wrap-around (last-write-wins scatter).

    Unlike the reference (shift_window_utils.py:145-147) wrap on *write* is
    permitted; window extents must not exceed the latent extents (a window
    larger than the ring would self-overlap).
    """
    B, F, H, W, C = latent.shape
    _, fs, hs, ws, _ = window.shape
    assert fs <= F and hs <= H and ws <= W, (
        f"window {window.shape} larger than ring {latent.shape}"
    )
    f0, h0, w0 = origin
    fi = wrap_slice_indices(f0, fs, F)
    hi = wrap_slice_indices(h0, hs, H)
    wi = wrap_slice_indices(w0, ws, W)
    return latent.at[:, fi[:, None, None], hi[None, :, None], wi[None, None, :], :].set(
        window
    )


def add_ring_window(
    latent: jnp.ndarray,
    window: jnp.ndarray,
    origin: Tuple,
) -> jnp.ndarray:
    """Accumulate a window with wrap-around (`+=` scatter).

    The primitive behind parallel overlap-blending: scatter-add windows and a
    matching count/weight buffer, then normalize — the commutative
    reformulation of the reference's sequential last-write-wins overlap
    semantics (cf. its own tiled VAE average,
    i2v_sphere_panorama_pipeline.py:546-560).
    """
    B, F, H, W, C = latent.shape
    _, fs, hs, ws, _ = window.shape
    f0, h0, w0 = origin
    fi = wrap_slice_indices(f0, fs, F)
    hi = wrap_slice_indices(h0, hs, H)
    wi = wrap_slice_indices(w0, ws, W)
    return latent.at[:, fi[:, None, None], hi[None, :, None], wi[None, None, :], :].add(
        window
    )


# ---------------------------------------------------------------------------
# Host-side reference helper (parity with shift_window_utils.py:14-38)
# ---------------------------------------------------------------------------


def dimension_slices_and_sizes(begin: int, end: int, size: int):
    """Split ``[begin, end)`` over a ring of extent ``size`` into contiguous
    (start, stop) pieces. Host-side geometry helper used by tests to verify
    the modular-index gather is equivalent to the reference's concat-of-slices
    (shift_window_utils.py:14-38)."""
    pieces = []
    pos = begin
    while pos < end:
        start = pos % size
        boundary = (pos // size + 1) * size
        stop = min(end, boundary)
        length = stop - pos
        pieces.append((start, start + length if start + length <= size else size))
        if start + length > size:
            pieces[-1] = (start, size)
            extra = (start + length) % size
            if extra > 0:
                pieces.append((0, extra))
        pos = stop
    return pieces


def ring_window_numpy(arr: np.ndarray, origin, sizes, axes=(1, 2, 3)) -> np.ndarray:
    """Numpy oracle for get_ring_window (used in tests)."""
    idx = [slice(None)] * arr.ndim
    out = arr
    for ax, o, s in zip(axes, origin, sizes):
        take = (np.arange(s) + o) % arr.shape[ax]
        out = np.take(out, take, axis=ax)
    return out
