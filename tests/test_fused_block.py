"""Parity tests for the whole-block fused kernels (ops/fused_block.py):
Pallas interpret mode vs the unfused module path on identical params.

One BasicTransformerBlock = self-attn -> attn2 (self or dual-KV cross) ->
GEGLU ff, all pre-LN with residuals (lvdm/modules/attention.py:187-220).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.attention import BasicTransformerBlock
from dynamicscaler_tpu.ops import fused_temporal


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    fused_temporal.set_mode("auto")


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def test_temporal_block_kernel_vs_module():
    # temporal: tokens = F = 4 frames (divides 128), attn2 is self
    blk = BasicTransformerBlock(dim=64, heads=1, dim_head=64)
    x = _rand(0, (96, 4, 64))

    fused_temporal.set_mode("off")
    p = blk.init(jax.random.PRNGKey(1), x)
    ref = blk.apply(p, x)

    fused_temporal.set_mode("interpret")
    got = blk.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("img_cross", [False, True])
def test_spatial_block_kernel_vs_module(img_cross):
    # spatial: N = 256 tokens, attn2 cross over 21(+16) context tokens
    # (odd text length exercises the sublane padding + key masks)
    blk = BasicTransformerBlock(
        dim=64, heads=1, dim_head=64, context_dim=128, img_cross_attention=img_cross
    )
    x = _rand(0, (6, 256, 64))
    L = 77 + 16 if img_cross else 21
    ctx = _rand(1, (6, L, 128))

    fused_temporal.set_mode("off")
    p = blk.init(jax.random.PRNGKey(2), x, ctx)
    ref = blk.apply(p, x, ctx)

    fused_temporal.set_mode("interpret")
    got = blk.apply(p, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_block_param_tree_unchanged():
    """params_only declaration must produce the identical tree to the
    unfused path (converter/checkpoint compatibility)."""
    blk = BasicTransformerBlock(
        dim=64, heads=1, dim_head=64, context_dim=128, img_cross_attention=True
    )
    x = jnp.zeros((2, 256, 64))
    ctx = jnp.zeros((2, 93, 128))

    fused_temporal.set_mode("off")
    p_off = jax.tree.map(lambda a: a.shape, blk.init(jax.random.PRNGKey(0), x, ctx))
    fused_temporal.set_mode("interpret")
    p_on = jax.tree.map(lambda a: a.shape, blk.init(jax.random.PRNGKey(0), x, ctx))
    assert p_off == p_on


def test_mask_falls_back():
    """causal-mask temporal blocks must take the unfused path (the block
    kernel has no mask support)."""
    blk = BasicTransformerBlock(dim=64, heads=1, dim_head=64)
    x = _rand(0, (32, 4, 64))
    mask = jnp.tril(jnp.ones((1, 4, 4), bool))

    fused_temporal.set_mode("off")
    p = blk.init(jax.random.PRNGKey(1), x, mask=mask)
    ref = blk.apply(p, x, mask=mask)
    fused_temporal.set_mode("interpret")
    got = blk.apply(p, x, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=5e-5)
