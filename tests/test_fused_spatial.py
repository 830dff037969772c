"""Fused spatial self-attention Pallas kernel vs the unfused XLA path.

The kernel (ops/fused_spatial.py) runs LN -> QKV -> full N-token attention
-> out-proj -> residual with VMEM-resident logits; on CPU it is exercised
in Pallas interpret mode and must match the manual-matmul path in
models/attention.py within float tolerance.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamicscaler_tpu.models.attention import CrossAttention, layer_norm
from dynamicscaler_tpu.ops import fused_spatial, fused_temporal


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    fused_temporal.set_mode("auto")


def _reference_subblock(x, s, b, wq, wk, wv, wo, bo, heads, scale):
    B, N, C = x.shape
    d = C // heads
    h = layer_norm(x, s, b)
    q, k, v = h @ wq, h @ wk, h @ wv

    def heads_split(t):
        return t.reshape(B, N, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads_split(q), heads_split(k), heads_split(v)
    logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    return o @ wo + bo + x


@pytest.mark.parametrize(
    "B,N,C,heads",
    [
        (3, 256, 64, 2),
        (2, 288, 32, 1),
        (1, 512, 128, 2),
        # the wide-gate mid/L3 shape admitted by default in round 5
        (1, 160, 1280, 20),
    ],
)
def test_kernel_matches_reference(rng, B, N, C, heads):
    fused_temporal.set_mode("interpret")
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)) * 0.5
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    mats = [
        jnp.asarray(rng.standard_normal((C, C)).astype(np.float32)) / np.sqrt(C)
        for _ in range(4)
    ]
    bo = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    scale = (C // heads) ** -0.5

    assert fused_spatial.fusable(N, C, C, heads)
    got = fused_spatial.fused_ln_spatial_attention(
        x, s, b, *mats, bo, heads=heads, scale=scale
    )
    ref = _reference_subblock(x, s, b, *mats, bo, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_batch_padding(rng):
    """Batch counts that don't divide the row tile are padded and sliced."""
    fused_temporal.set_mode("interpret")
    B, N, C, heads = 5, 256, 32, 1
    # small N*C -> TB = 8 > B=5
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    s = jnp.ones(C)
    b = jnp.zeros(C)
    mats = [jnp.eye(C, dtype=jnp.float32) * 0.3 for _ in range(4)]
    bo = jnp.zeros(C)
    got = fused_spatial.fused_ln_spatial_attention(
        x, s, b, *mats, bo, heads=heads, scale=0.125
    )
    ref = _reference_subblock(x, s, b, *mats, bo, heads, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_module_dispatch_fused_equals_unfused(rng):
    """CrossAttention with spatial-shaped inputs (N too large for the
    temporal kernel) dispatches to the spatial kernel and matches."""
    mod = CrossAttention(heads=2, dim_head=16, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 256, 32)).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(32).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(32).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x, ln=(s, b), add_residual=True)

    fused_temporal.set_mode("off")
    assert not fused_spatial.fusable(256, 32, 32, 2)  # off gates both
    ref = mod.apply(params, x, ln=(s, b), add_residual=True)
    fused_temporal.set_mode("interpret")
    assert fused_spatial.fusable(256, 32, 32, 2)
    assert not fused_temporal.fusable(256, 32, 32, 2)
    got = mod.apply(params, x, ln=(s, b), add_residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_gate_excludes_unsupported_shapes():
    fused_temporal.set_mode("interpret")
    assert not fused_spatial.fusable(40, 1280, 1280, 20)  # mid block: tiny N
    assert not fused_spatial.fusable(2560, 320, 640, 5)  # non-square proj
    assert not fused_spatial.fusable(2561, 320, 320, 5)  # ragged tokens
    # L3 (160, 1280): admitted by the wide gate (measured win, round 5);
    # DSCALER_SPATIAL_WIDE=0 restores the narrow gate that rejects it
    assert fused_spatial.fusable(160, 1280, 1280, 20)
    os.environ["DSCALER_SPATIAL_WIDE"] = "0"
    try:
        assert not fused_spatial.fusable(160, 1280, 1280, 20)
        assert not fused_spatial.fusable(512, 1280, 1280, 20)  # narrow: C>640
    finally:
        del os.environ["DSCALER_SPATIAL_WIDE"]
    assert fused_spatial.fusable(2560, 320, 320, 5)
    assert fused_spatial.fusable(640, 640, 640, 10)


@pytest.mark.parametrize("img", [False, True])
def test_cross_attention_fused_equals_unfused(rng, img):
    """Module dispatch: fused cross-attention (interpret) == the unfused
    path, dual image-KV included (lvdm attention.py:116-124)."""
    mod = CrossAttention(
        heads=2, dim_head=16, context_dim=128, img_cross_attention=img,
        text_context_len=7, dtype=jnp.float32,
    )
    x = jnp.asarray(rng.standard_normal((3, 256, 32)).astype(np.float32)) * 0.5
    L = 7 + (4 if img else 0)
    ctx = jnp.asarray(rng.standard_normal((3, L, 128)).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(32).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(32).astype(np.float32))
    params = mod.init(
        jax.random.PRNGKey(0), x, context=ctx, ln=(s, b), add_residual=True
    )

    fused_temporal.set_mode("off")
    ref = mod.apply(params, x, context=ctx, ln=(s, b), add_residual=True)
    fused_temporal.set_mode("interpret")
    assert fused_spatial.cross_fusable(256, 32, 32, 2, 128)
    got = mod.apply(params, x, context=ctx, ln=(s, b), add_residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_cross_gate():
    fused_temporal.set_mode("interpret")
    assert fused_spatial.cross_fusable(2560, 320, 320, 5, 1024)
    assert fused_spatial.cross_fusable(160, 1280, 1280, 20, 1024)
    assert not fused_spatial.cross_fusable(40, 1280, 1280, 20, 1024)  # mid
    assert not fused_spatial.cross_fusable(2560, 320, 320, 5, 100)  # ragged ctx
