"""Parity for the x-transformer stack (models/x_transformer.py) against the
vendored reference module (lvdm/modules/x_transformer.py — dead code in the
reference tree, rebuilt for surface completeness).

Covers the reference's configuration space: norm variants (LayerNorm /
ScaleNorm / RMSNorm / Rezero), pre/post-norm, talking heads, memory KV,
sparse top-k, GEGLU, GRU-gated residuals, causal masks, shortformer PIA,
residual attention, sandwich / par_ratio layer layouts, on_attn GLU heads,
cross-attention with context masks, and the TransformerWrapper (emb
projection, memory tokens, tied embeddings). The reference's macaron path
is proven broken in-tree (Scale.forward tuple-unpacks a tensor,
x_transformer.py:122-124) — documented by a crash test.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from dynamicscaler_tpu.models import x_transformer as X

torch.manual_seed(0)

B, N, D = 2, 10, 32
TOL = 2e-5


def _ref():
    from lvdm.modules import x_transformer as T

    return T


def to_sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def assert_close(a, b, tol=TOL):
    a, b = np.asarray(a), np.asarray(b)
    err = np.abs(a - b).max()
    rel = err / (np.abs(b).max() + 1e-9)
    assert rel < tol, f"maxerr={err:.3e} rel={rel:.3e}"


@pytest.fixture()
def x():
    return torch.randn(B, N, D)


def test_plain_encoder(x):
    T = _ref()
    t = T.AttentionLayers(dim=D, depth=2, heads=4, attn_dim_head=8)
    t.eval()
    with torch.no_grad():
        ref = t(x)
    f = X.AttentionLayers(dim=D, depth=2, heads=4, attn_kwargs={"dim_head": 8})
    params = {"params": X.convert_attention_layers(to_sd(t), f.layer_types)}
    out = f.apply(params, jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy())


def test_talking_heads_memkv_topk_geglu_gru(x):
    T = _ref()
    t = T.AttentionLayers(
        dim=D, depth=2, heads=4, attn_dim_head=8, attn_talking_heads=True,
        attn_num_mem_kv=3, attn_sparse_topk=6, ff_glu=True, gate_residual=True,
    )
    t.eval()
    with torch.no_grad():
        ref = t(x)
    f = X.AttentionLayers(
        dim=D, depth=2, heads=4, gate_residual=True,
        attn_kwargs={"dim_head": 8, "talking_heads": True, "num_mem_kv": 3,
                     "sparse_topk": 6},
        ff_kwargs={"glu": True},
    )
    params = {"params": X.convert_attention_layers(
        to_sd(t), f.layer_types, gate_residual=True, ff_glu=True)}
    out = f.apply(params, jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy())


def test_causal_rms_residual_attn_pia_mask(x):
    T = _ref()
    t = T.AttentionLayers(
        dim=D, depth=3, heads=4, attn_dim_head=8, causal=True,
        use_rmsnorm=True, residual_attn=True, position_infused_attn=True,
    )
    t.eval()
    mask = torch.ones(B, N, dtype=torch.bool)
    mask[:, -3:] = False
    with torch.no_grad():
        ref = t(x, mask=mask)
    f = X.AttentionLayers(
        dim=D, depth=3, heads=4, causal=True, use_rmsnorm=True,
        residual_attn=True, position_infused_attn=True,
        attn_kwargs={"dim_head": 8},
    )
    params = {"params": X.convert_attention_layers(
        to_sd(t), f.layer_types, use_rmsnorm=True)}
    out = f.apply(params, jnp.asarray(x.numpy()), mask=jnp.asarray(mask.numpy()))
    m = mask.numpy()[..., None]
    assert_close(out * m, ref.numpy() * m)


def test_reference_macaron_is_broken(x):
    """Scale.forward does `x, *rest = self.fn(x)` on a raw tensor
    (x_transformer.py:122-124), so the reference's macaron layout crashes;
    our macaron keeps upstream-lucidrains semantics (0.5-scaled ff)."""
    T = _ref()
    t = T.AttentionLayers(dim=D, depth=1, heads=4, attn_dim_head=8, macaron=True)
    t.eval()
    with pytest.raises(TypeError):
        with torch.no_grad():
            t(x)
    # ours runs and differs from non-macaron only by the extra scaled-ff layer
    f = X.AttentionLayers(dim=D, depth=1, heads=4, macaron=True,
                          attn_kwargs={"dim_head": 8})
    assert f.layer_types == ("f", "a", "f")


def test_cross_rezero_postnorm_sandwich_onattn(x):
    T = _ref()
    t = T.AttentionLayers(
        dim=D, depth=3, heads=4, attn_dim_head=8, cross_attend=True,
        use_rezero=True, pre_norm=False, sandwich_coef=1, attn_on_attn=True,
    )
    t.eval()
    # rezero inits g=0 -> output==input; perturb gains to make it non-vacuous
    with torch.no_grad():
        for m in t.modules():
            if hasattr(m, "g") and torch.is_tensor(m.g) and m.g.numel() == 1:
                m.g.fill_(0.37)
    ctx = torch.randn(B, 7, D)
    cmask = torch.ones(B, 7, dtype=torch.bool)
    cmask[:, -2:] = False
    with torch.no_grad():
        ref = t(x, context=ctx, context_mask=cmask)
    f = X.AttentionLayers(
        dim=D, depth=3, heads=4, cross_attend=True, use_rezero=True,
        pre_norm=False, sandwich_coef=1,
        attn_kwargs={"dim_head": 8, "on_attn": True},
    )
    params = {"params": X.convert_attention_layers(
        to_sd(t), f.layer_types, use_rezero=True)}
    out = f.apply(params, jnp.asarray(x.numpy()), context=jnp.asarray(ctx.numpy()),
                  context_mask=jnp.asarray(cmask.numpy()))
    assert_close(out, ref.numpy())


def test_scalenorm_par_ratio_layout(x):
    T = _ref()
    t = T.AttentionLayers(
        dim=D, depth=4, heads=4, attn_dim_head=8, use_scalenorm=True, par_ratio=4,
    )
    t.eval()
    with torch.no_grad():
        ref = t(x)
    f = X.AttentionLayers(
        dim=D, depth=4, heads=4, use_scalenorm=True, par_ratio=4,
        attn_kwargs={"dim_head": 8},
    )
    assert tuple(t.layer_types) == f.layer_types
    params = {"params": X.convert_attention_layers(
        to_sd(t), f.layer_types, use_scalenorm=True)}
    out = f.apply(params, jnp.asarray(x.numpy()))
    assert_close(out, ref.numpy())


def test_wrapper_project_emb_memory_tokens(x):
    T = _ref()
    enc = T.Encoder(dim=D, depth=2, heads=4, attn_dim_head=8)
    t = T.TransformerWrapper(
        num_tokens=50, max_seq_len=24, attn_layers=enc, emb_dim=24,
        num_memory_tokens=2, tie_embedding=False,
    )
    t.eval()
    toks = torch.randint(0, 50, (B, N))
    tmask = torch.ones(B, N, dtype=torch.bool)
    tmask[:, -2:] = False
    with torch.no_grad():
        ref = t(toks, mask=tmask)
        ref_emb = t(toks, mask=tmask, return_embeddings=True)
    cfg = dict(dim=D, depth=2, heads=4, attn_kwargs={"dim_head": 8})
    f = X.TransformerWrapper(
        num_tokens=50, max_seq_len=24, attn_layers_cfg=cfg, emb_dim=24,
        num_memory_tokens=2,
    )
    params = {"params": X.convert_transformer_wrapper(
        to_sd(t), X.AttentionLayers(**cfg).layer_types,
        has_project_emb=True, num_memory_tokens=2)}
    jt, jm = jnp.asarray(toks.numpy()), jnp.asarray(tmask.numpy())
    out = f.apply(params, jt, mask=jm)
    out_emb = f.apply(params, jt, mask=jm, return_embeddings=True)
    m = tmask.numpy()[..., None]
    assert_close(out * m, ref.numpy() * m)
    assert_close(out_emb * m, ref_emb.numpy() * m)


def test_wrapper_tied_embedding():
    T = _ref()
    t = T.TransformerWrapper(
        num_tokens=50, max_seq_len=24,
        attn_layers=T.Encoder(dim=D, depth=1, heads=4, attn_dim_head=8),
        tie_embedding=True,
    )
    t.eval()
    toks = torch.randint(0, 50, (B, N))
    with torch.no_grad():
        ref = t(toks)
    cfg = dict(dim=D, depth=1, heads=4, attn_kwargs={"dim_head": 8})
    f = X.TransformerWrapper(
        num_tokens=50, max_seq_len=24, attn_layers_cfg=cfg, tie_embedding=True,
    )
    params = {"params": X.convert_transformer_wrapper(
        to_sd(t), X.AttentionLayers(**cfg).layer_types, tie_embedding=True)}
    out = f.apply(params, jnp.asarray(toks.numpy()))
    assert_close(out, ref.numpy())
