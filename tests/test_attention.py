"""Attention implementations must agree."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.ops.attention import (
    naive_attention,
    chunked_attention,
    attention,
)


def test_chunked_matches_naive(rng):
    q = jnp.asarray(rng.standard_normal((2, 3, 70, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, 130, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, 130, 16)).astype(np.float32))
    ref = naive_attention(q, k, v, 0.25)
    got = chunked_attention(q, k, v, 0.25, chunk=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_chunked_ragged_tail(rng):
    """M not a multiple of chunk: padded keys must not leak."""
    q = jnp.asarray(rng.standard_normal((1, 1, 5, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 33, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 33, 8)).astype(np.float32))
    ref = naive_attention(q, k, v, 1.0)
    got = chunked_attention(q, k, v, 1.0, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_auto_dispatch_large_uses_chunked(rng):
    # large self-attn goes through chunked on CPU and stays numerically right
    q = jnp.asarray(rng.standard_normal((1, 1, 2048, 8)).astype(np.float32)) * 0.1
    out_auto = attention(q, q, q, 0.35, impl="auto")
    out_naive = naive_attention(q, q, q, 0.35)
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_naive), atol=3e-5)


def test_bias_and_mask_fall_back_to_naive(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 6, 4)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((1, 2, 6, 6)).astype(np.float32))
    mask = jnp.tril(jnp.ones((6, 6), bool))[None, None]
    out = attention(q, q, q, 0.5, bias=bias, mask=mask)
    ref = naive_attention(q, q, q, 0.5, bias=bias, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


# The Pallas temporal-attention kernel is covered by tests/test_fused_temporal.py.
