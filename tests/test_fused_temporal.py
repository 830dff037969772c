"""Fused temporal-attention Pallas kernel vs the unfused XLA path.

The kernel (ops/fused_temporal.py) runs the whole LN -> QKV -> F-token
attention -> out-proj -> residual sub-block; on CPU it is exercised in
Pallas interpret mode and must match the manual-matmul path in
models/attention.py within float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamicscaler_tpu.models.attention import (
    BasicTransformerBlock,
    CrossAttention,
    layer_norm,
)
from dynamicscaler_tpu.ops import fused_temporal


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    fused_temporal.set_mode("auto")


def _reference_subblock(x, s, b, wq, wk, wv, wo, bo, heads, scale):
    """Straight-line numpy-style reference of the fused sub-block."""
    R, F, C = x.shape
    d = C // heads
    h = layer_norm(x, s, b)
    q = h @ wq
    k = h @ wk
    v = h @ wv

    def heads_split(t):
        return t.reshape(R, F, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads_split(q), heads_split(k), heads_split(v)
    logits = jnp.einsum("rhfd,rhgd->rhfg", qh, kh).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("rhfg,rhgd->rhfd", p, vh)
    o = o.transpose(0, 2, 1, 3).reshape(R, F, C)
    return o @ wo + bo + x


@pytest.mark.parametrize("R,F,C,heads", [(24, 16, 64, 2), (8, 8, 32, 4), (4, 16, 256, 4)])
def test_kernel_matches_reference(rng, R, F, C, heads):
    fused_temporal.set_mode("interpret")
    x = jnp.asarray(rng.standard_normal((R, F, C)).astype(np.float32)) * 0.5
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    mats = [
        jnp.asarray(rng.standard_normal((C, C)).astype(np.float32)) / np.sqrt(C)
        for _ in range(4)
    ]
    bo = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    scale = (C // heads) ** -0.5

    got = fused_temporal.fused_ln_attention(
        x, s, b, *mats, bo, heads=heads, scale=scale
    )
    ref = _reference_subblock(x, s, b, *mats, bo, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_kernel_row_padding(rng):
    """Row counts that don't divide the tile are padded and sliced back."""
    fused_temporal.set_mode("interpret")
    R, F, C, heads = 5, 16, 64, 1
    x = jnp.asarray(rng.standard_normal((R, F, C)).astype(np.float32))
    s = jnp.ones(C)
    b = jnp.zeros(C)
    mats = [jnp.eye(C, dtype=jnp.float32) * 0.3 for _ in range(4)]
    bo = jnp.zeros(C)
    got = fused_temporal.fused_ln_attention(x, s, b, *mats, bo, heads=heads, scale=0.125)
    ref = _reference_subblock(x, s, b, *mats, bo, heads, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_cross_attention_fused_equals_unfused(rng):
    """The full module path: fused (interpret) == unfused, same params."""
    mod = CrossAttention(heads=2, dim_head=16, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((6, 16, 32)).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(32).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(32).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x, ln=(s, b), add_residual=True)

    fused_temporal.set_mode("off")
    ref = mod.apply(params, x, ln=(s, b), add_residual=True)
    fused_temporal.set_mode("interpret")
    got = mod.apply(params, x, ln=(s, b), add_residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_block_param_tree_unchanged(rng):
    """The param-holder restructure must keep nn.Dense/nn.LayerNorm paths
    (converter + round-1 checkpoints depend on them)."""
    blk = BasicTransformerBlock(
        dim=32, heads=2, dim_head=16, context_dim=24, img_cross_attention=True
    )
    x = jnp.zeros((2, 16, 32))
    ctx = jnp.zeros((2, 77 + 16, 24))
    params = blk.init(jax.random.PRNGKey(0), x, context=ctx)["params"]
    flat = jax.tree_util.tree_map_with_path(lambda p, v: None, params)
    paths = {"/".join(str(k.key) for k in kp) for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    expected = {
        "norm1/scale", "norm1/bias", "norm2/scale", "norm2/bias",
        "norm3/scale", "norm3/bias",
        "attn1/to_q/kernel", "attn1/to_k/kernel", "attn1/to_v/kernel",
        "attn1/to_out/kernel", "attn1/to_out/bias",
        "attn2/to_q/kernel", "attn2/to_k/kernel", "attn2/to_v/kernel",
        "attn2/to_k_ip/kernel", "attn2/to_v_ip/kernel",
        "attn2/to_out/kernel", "attn2/to_out/bias",
        "ff/geglu/proj/kernel", "ff/geglu/proj/bias",
        "ff/out/kernel", "ff/out/bias",
    }
    assert paths == expected, paths.symmetric_difference(expected)


def test_ff_kernel_matches_unfused(rng):
    """Fused LN+GEGLU kernel (interpret) == the manual-matmul FF path."""
    from dynamicscaler_tpu.models.layers import FeedForward

    mod = FeedForward(dim=128, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 10, 128)).astype(np.float32)) * 0.7
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(128).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(128).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x, ln=(s, b), add_residual=True)

    fused_temporal.set_mode("off")
    ref = mod.apply(params, x, ln=(s, b), add_residual=True)
    fused_temporal.set_mode("interpret")
    got = mod.apply(params, x, ln=(s, b), add_residual=True)
    # the kernel's polynomial erf differs from XLA erf by <=1.5e-7 abs
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)
