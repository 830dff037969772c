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


def test_text_context_len_plumbs_to_cross_attention(rng):
    """UNetConfig.text_context_len must reach the dual-KV split (reference
    hardcodes 77 at attention.py:60; we expose it as a config knob, and it
    was once silently disconnected). Two transformers identical except for
    the split point must produce different outputs on a context whose text
    and image halves differ."""
    from dynamicscaler_tpu.models.unet3d import SpatialTransformer

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    ctx = jnp.concatenate(
        [
            jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32)),
            2.0 + jnp.zeros((2, 8, 32), jnp.float32),
        ],
        axis=1,
    )
    outs = []
    for tlen in (8, 12):
        st = SpatialTransformer(
            channels=32, heads=2, dim_head=16, context_dim=32,
            img_cross_attention=True, text_context_len=tlen,
        )
        p = st.init(jax.random.PRNGKey(0), x, ctx)
        # proj_out is zero-init, which would mask the split entirely
        p = jax.tree.map(lambda a: jnp.where(a == 0, 0.02, a), p)
        outs.append(np.asarray(st.apply(p, x, ctx)))
    assert np.abs(outs[0] - outs[1]).max() > 1e-6, (
        "text_context_len had no effect: the split is disconnected"
    )
