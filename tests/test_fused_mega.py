"""Parity tests for the whole-transformer mega kernels (ops/fused_mega.py):
interpret mode vs the unfused module path on the same params, for the
Spatial and Temporal transformer wrappers (lvdm/modules/attention.py:
223-278, 281-373 with depth-1 blocks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.unet3d import SpatialTransformer, TemporalTransformer
from dynamicscaler_tpu.ops import fused_temporal


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    fused_temporal.set_mode("auto")


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def test_temporal_mega_vs_module():
    # F=4 frames, H*W rows; C=64 (mega gate: depth 1, F | 128, C <= 640)
    tt = TemporalTransformer(channels=64, heads=1, dim_head=64, temporal_length=4)
    x = _rand(0, (2 * 4, 8, 16, 64))

    fused_temporal.set_mode("off")
    p = tt.init(jax.random.PRNGKey(1), x, 4)
    ref = tt.apply(p, x, 4)

    fused_temporal.set_mode("interpret")
    got = tt.apply(p, x, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("img_cross", [False, True])
def test_spatial_mega_vs_module(img_cross):
    st = SpatialTransformer(
        channels=64, heads=1, dim_head=64, context_dim=128,
        img_cross_attention=img_cross,
    )
    x = _rand(0, (6, 16, 16, 64))  # N = 256 tokens
    L = 77 + 16 if img_cross else 21
    ctx = _rand(1, (6, L, 128))

    fused_temporal.set_mode("off")
    p = st.init(jax.random.PRNGKey(2), x, ctx)
    ref = st.apply(p, x, ctx)

    fused_temporal.set_mode("interpret")
    got = st.apply(p, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_mega_param_tree_unchanged():
    tt = TemporalTransformer(channels=64, heads=1, dim_head=64, temporal_length=4)
    x = jnp.zeros((2 * 4, 8, 16, 64))
    fused_temporal.set_mode("off")
    p_off = jax.tree.map(lambda a: a.shape, tt.init(jax.random.PRNGKey(0), x, 4))
    fused_temporal.set_mode("interpret")
    p_on = jax.tree.map(lambda a: a.shape, tt.init(jax.random.PRNGKey(0), x, 4))
    assert p_off == p_on


def test_l3_routing_wrap_block_parity():
    """C=1280-style routing (mega gated off): temporal wrap+block kernels
    with the odd TH=5 tile (H=10, W=16 — the real L3 geometry), and
    spatial N=160 (block gate excludes N<256 -> wrap + cross/ff kernels)."""
    tt = TemporalTransformer(
        channels=128, heads=2, dim_head=64, temporal_length=16,
        dtype=jnp.bfloat16,
    )
    x = _rand(0, (2 * 16, 10, 16, 128), jnp.bfloat16)
    fused_temporal.set_mode("off")
    p = tt.init(jax.random.PRNGKey(1), x, 16)
    ref = tt.apply(p, x, 16)
    fused_temporal.set_mode("interpret")
    try:
        fused_temporal._DISABLED = frozenset(["mega"])
        got = tt.apply(p, x, 16)
    finally:
        fused_temporal._DISABLED = frozenset()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )

    st = SpatialTransformer(
        channels=128, heads=2, dim_head=64, context_dim=128,
        img_cross_attention=True, dtype=jnp.bfloat16,
    )
    ctx = _rand(3, (2 * 16, 93, 128), jnp.bfloat16)
    fused_temporal.set_mode("off")
    ps = st.init(jax.random.PRNGKey(4), x, ctx)
    refs = st.apply(ps, x, ctx)
    fused_temporal.set_mode("interpret")
    gots = st.apply(ps, x, ctx)
    np.testing.assert_allclose(
        np.asarray(gots, np.float32), np.asarray(refs, np.float32), atol=2e-2
    )


def test_mega_disable_falls_back_to_block_path():
    """DSCALER_FUSE_DISABLE=mega must route through the wrapper + block
    kernels with identical results."""
    tt = TemporalTransformer(channels=64, heads=1, dim_head=64, temporal_length=4)
    x = _rand(0, (2 * 4, 8, 16, 64), jnp.bfloat16)
    tt = TemporalTransformer(channels=64, heads=1, dim_head=64,
                             temporal_length=4, dtype=jnp.bfloat16)

    fused_temporal.set_mode("interpret")
    p = tt.init(jax.random.PRNGKey(1), x, 4)
    mega = tt.apply(p, x, 4)
    try:
        fused_temporal._DISABLED = frozenset(["mega"])
        block = tt.apply(p, x, 4)
    finally:
        fused_temporal._DISABLED = frozenset()
    np.testing.assert_allclose(
        np.asarray(mega, np.float32), np.asarray(block, np.float32),
        atol=2e-2, rtol=2e-2,
    )
