"""Ring window gather/scatter vs numpy oracle (wrap-around semantics of
utils/shift_window_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.ops.ring import (
    get_ring_window,
    set_ring_window,
    add_ring_window,
    ring_window_numpy,
    dimension_slices_and_sizes,
)


def make_latent(rng, shape=(1, 8, 10, 16, 4)):
    return rng.standard_normal(shape).astype(np.float32)


def test_get_no_wrap(rng):
    lat = make_latent(rng)
    out = get_ring_window(jnp.asarray(lat), (2, 3, 4), (4, 5, 6))
    np.testing.assert_array_equal(np.asarray(out), lat[:, 2:6, 3:8, 4:10])


def test_get_wrap_all_axes(rng):
    lat = make_latent(rng)
    origin, sizes = (6, 7, 12), (5, 6, 9)
    out = get_ring_window(jnp.asarray(lat), origin, sizes)
    ref = ring_window_numpy(lat, origin, sizes)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_get_origin_beyond_extent(rng):
    """Reference allows begin up to 2x extent (shift_window_utils.py:73-75)."""
    lat = make_latent(rng)
    out = get_ring_window(jnp.asarray(lat), (9, 12, 20), (4, 4, 4))
    ref = ring_window_numpy(lat, (9, 12, 20), (4, 4, 4))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_set_roundtrip(rng):
    lat = make_latent(rng)
    win = rng.standard_normal((1, 4, 5, 6, 4)).astype(np.float32)
    updated = set_ring_window(jnp.asarray(lat), jnp.asarray(win), (6, 8, 13))
    back = get_ring_window(updated, (6, 8, 13), (4, 5, 6))
    np.testing.assert_array_equal(np.asarray(back), win)
    # untouched region intact
    np.testing.assert_array_equal(np.asarray(updated)[:, 4, 0, 0], lat[:, 4, 0, 0])


def test_set_wrap_matches_two_writes(rng):
    lat = make_latent(rng)
    win = rng.standard_normal((1, 8, 10, 6, 4)).astype(np.float32)
    updated = np.asarray(
        set_ring_window(jnp.asarray(lat), jnp.asarray(win), (0, 0, 13))
    )
    ref = lat.copy()
    ref[:, :, :, 13:16] = win[:, :, :, :3]
    ref[:, :, :, 0:3] = win[:, :, :, 3:]
    np.testing.assert_array_equal(updated, ref)


def test_add_window_accumulates(rng):
    lat = np.zeros((1, 4, 6, 8, 2), np.float32)
    win = np.ones((1, 4, 6, 6, 2), np.float32)
    # two overlapping adds; overlap [w 4:6] and wrapped overlap [w 0:2]
    out = add_ring_window(jnp.asarray(lat), jnp.asarray(win), (0, 0, 0))
    out = add_ring_window(out, jnp.asarray(win), (0, 0, 4))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[:, :, :, 4:6], 2 * np.ones((1, 4, 6, 2, 2)))
    np.testing.assert_array_equal(out[:, :, :, 0:2], 2 * np.ones((1, 4, 6, 2, 2)))
    np.testing.assert_array_equal(out[:, :, :, 2:4], np.ones((1, 4, 6, 2, 2)))


def test_traced_origin_jit(rng):
    """Window origins may be traced (per-step offsets inside one jit)."""
    lat = jnp.asarray(make_latent(rng))

    @jax.jit
    def f(lat, o):
        return get_ring_window(lat, (o, o + 1, o * 2), (4, 4, 4))

    for o in [0, 3, 7]:
        out = f(lat, jnp.asarray(o))
        ref = ring_window_numpy(np.asarray(lat), (o, o + 1, o * 2), (4, 4, 4))
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_dimension_slices_match_reference_semantics():
    # [3, 9) over ring of 8 -> (3,8) + (0,1)
    assert dimension_slices_and_sizes(3, 9, 8) == [(3, 8), (0, 1)]
    # no wrap
    assert dimension_slices_and_sizes(2, 5, 8) == [(2, 5)]
    # begin beyond extent: [9, 12) over 8 -> (1, 4)
    assert dimension_slices_and_sizes(9, 12, 8) == [(1, 4)]
    # full wrap twice region: [6, 14) over 8 -> (6,8) + (0,6)
    assert dimension_slices_and_sizes(6, 14, 8) == [(6, 8), (0, 6)]
