"""CLIP tower parity vs an independent torch composition.

open_clip is not installed; the oracle assembles the standard OpenCLIP
tower from torch primitives (nn.MultiheadAttention pre-LN blocks, causal
mask, penultimate-layer stop + ln_final) and emits a state_dict in OpenCLIP
naming — validating the converter mapping, mask semantics, and layer
slicing end-to-end.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from dynamicscaler_tpu.config import CLIPTextConfig, CLIPVisionConfig
from dynamicscaler_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from dynamicscaler_tpu.utils import weights as W

torch.manual_seed(1)


class TorchBlock(torch.nn.Module):
    def __init__(self, width, heads, quick_gelu=False):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.ModuleDict(
            {"c_fc": torch.nn.Linear(width, 4 * width), "c_proj": torch.nn.Linear(4 * width, width)}
        )
        self.quick_gelu = quick_gelu

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, attn_mask=attn_mask, need_weights=False)
        x = x + a
        h = self.mlp["c_fc"](self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h) if self.quick_gelu else torch.nn.functional.gelu(h)
        return x + self.mlp["c_proj"](h)


def _block_sd(prefix, blk):
    sd = {}
    sd[f"{prefix}.ln_1.weight"] = blk.ln_1.weight
    sd[f"{prefix}.ln_1.bias"] = blk.ln_1.bias
    sd[f"{prefix}.ln_2.weight"] = blk.ln_2.weight
    sd[f"{prefix}.ln_2.bias"] = blk.ln_2.bias
    sd[f"{prefix}.attn.in_proj_weight"] = blk.attn.in_proj_weight
    sd[f"{prefix}.attn.in_proj_bias"] = blk.attn.in_proj_bias
    sd[f"{prefix}.attn.out_proj.weight"] = blk.attn.out_proj.weight
    sd[f"{prefix}.attn.out_proj.bias"] = blk.attn.out_proj.bias
    sd[f"{prefix}.mlp.c_fc.weight"] = blk.mlp["c_fc"].weight
    sd[f"{prefix}.mlp.c_fc.bias"] = blk.mlp["c_fc"].bias
    sd[f"{prefix}.mlp.c_proj.weight"] = blk.mlp["c_proj"].weight
    sd[f"{prefix}.mlp.c_proj.bias"] = blk.mlp["c_proj"].bias
    return sd


def test_text_tower_parity_penultimate():
    vocab, width, layers, heads, ctx_len = 64, 32, 3, 4, 10
    blocks = [TorchBlock(width, heads).eval() for _ in range(layers)]
    tok_emb = torch.randn(vocab, width) * 0.02
    pos_emb = torch.randn(ctx_len, width) * 0.01
    ln_final = torch.nn.LayerNorm(width).eval()

    sd = {"token_embedding.weight": tok_emb, "positional_embedding": pos_emb,
          "ln_final.weight": ln_final.weight, "ln_final.bias": ln_final.bias}
    for i, b in enumerate(blocks):
        sd.update(_block_sd(f"transformer.resblocks.{i}", b))

    cfg = CLIPTextConfig(vocab_size=vocab, width=width, layers=layers, heads=heads,
                         context_length=ctx_len, penultimate=True)
    params = W.convert_clip_text(sd, cfg)

    tokens = np.array([[1, 5, 9, 3, 0, 0, 0, 0, 0, 0]], np.int32)
    # torch oracle: penultimate -> run layers-1 blocks, causal mask, ln_final
    mask = torch.full((ctx_len, ctx_len), float("-inf")).triu(1)
    with torch.no_grad():
        x = tok_emb[torch.from_numpy(tokens).long()] + pos_emb
        for b in blocks[: layers - 1]:
            x = b(x, attn_mask=mask)
        ref = ln_final(x).numpy()

    got = CLIPTextEncoder(cfg).apply(params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_vision_tower_parity_full_tokens():
    width, layers, heads, img, patch = 32, 2, 4, 32, 16
    grid = img // patch
    conv1 = torch.nn.Conv2d(3, width, patch, stride=patch, bias=False).eval()
    cls = torch.randn(width) * 0.02
    pos = torch.randn(grid * grid + 1, width) * 0.01
    ln_pre = torch.nn.LayerNorm(width).eval()
    blocks = [TorchBlock(width, heads).eval() for _ in range(layers)]

    sd = {"conv1.weight": conv1.weight, "class_embedding": cls,
          "positional_embedding": pos, "ln_pre.weight": ln_pre.weight,
          "ln_pre.bias": ln_pre.bias}
    for i, b in enumerate(blocks):
        sd.update(_block_sd(f"transformer.resblocks.{i}", b))

    cfg = CLIPVisionConfig(image_size=img, patch_size=patch, width=width,
                           layers=layers, heads=heads, output_tokens=grid * grid + 1)
    params = W.convert_clip_vision(sd, cfg)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        h = conv1(torch.from_numpy(x)).reshape(1, width, -1).permute(0, 2, 1)
        h = torch.cat([cls.expand(1, 1, width), h], dim=1) + pos
        h = ln_pre(h)
        for b in blocks:
            h = b(h)  # V2 returns the full sequence, no ln_post/proj
        ref = h.numpy()

    got = CLIPVisionEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_vision_pooled_parity(quick_gelu):
    """Pooled CLS -> ln_post -> @proj path shared by ClipImageEmbedder
    (condition.py:136-171, QuickGELU) and the pooled
    FrozenOpenCLIPImageEmbedder (:238-295, exact GELU)."""
    from dynamicscaler_tpu.models.clip import CLIPVisionPooled

    width, layers, heads, img, patch, out_dim = 32, 2, 4, 32, 16, 24
    grid = img // patch
    conv1 = torch.nn.Conv2d(3, width, patch, stride=patch, bias=False).eval()
    cls = torch.randn(width) * 0.02
    pos = torch.randn(grid * grid + 1, width) * 0.01
    ln_pre = torch.nn.LayerNorm(width).eval()
    ln_post = torch.nn.LayerNorm(width).eval()
    with torch.no_grad():
        ln_post.weight.mul_(0).add_(torch.randn(width))
        ln_post.bias.add_(torch.randn(width) * 0.1)
    proj = torch.randn(width, out_dim) * width**-0.5
    blocks = [TorchBlock(width, heads, quick_gelu=quick_gelu).eval() for _ in range(layers)]

    sd = {"conv1.weight": conv1.weight, "class_embedding": cls,
          "positional_embedding": pos, "ln_pre.weight": ln_pre.weight,
          "ln_pre.bias": ln_pre.bias, "ln_post.weight": ln_post.weight,
          "ln_post.bias": ln_post.bias, "proj": proj}
    for i, b in enumerate(blocks):
        sd.update(_block_sd(f"transformer.resblocks.{i}", b))

    cfg = CLIPVisionConfig(image_size=img, patch_size=patch, width=width,
                           layers=layers, heads=heads,
                           output_tokens=grid * grid + 1, output_dim=out_dim)
    params = W.convert_clip_vision_pooled(sd, cfg)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        h = conv1(torch.from_numpy(x)).reshape(2, width, -1).permute(0, 2, 1)
        h = torch.cat([cls.expand(2, 1, width), h], dim=1) + pos
        h = ln_pre(h)
        for b in blocks:
            h = b(h)
        ref = (ln_post(h[:, 0]) @ proj).numpy()

    got = CLIPVisionPooled(cfg, quick_gelu=quick_gelu).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (2, out_dim)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_ucg_dropout_semantics():
    """condition.py:169-170/:284-285 bernoulli row dropout: no_dropout /
    key=None / rate=0 are identity; rate=1 zeros everything; a keyed mask
    zeros whole rows only."""
    import jax
    from dynamicscaler_tpu.models.clip import ucg_dropout

    z = jnp.asarray(np.random.default_rng(3).standard_normal((8, 5)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(ucg_dropout(z, key, 0.5, no_dropout=True), z)
    np.testing.assert_array_equal(ucg_dropout(z, None, 0.5), z)
    np.testing.assert_array_equal(ucg_dropout(z, key, 0.0), z)
    np.testing.assert_array_equal(ucg_dropout(z, key, 1.0), np.zeros_like(z))
    out = np.asarray(ucg_dropout(z, key, 0.5))
    row_zero = (out == 0).all(axis=1)
    row_kept = (out == np.asarray(z)).all(axis=1)
    assert (row_zero | row_kept).all()


def test_pooled_embedder_wrappers():
    """OpenCLIPImageEmbedderPooled / ClipImageEmbedder end-to-end: [-1,1]
    NHWC input through preprocess + tower + dropout."""
    import jax
    from dynamicscaler_tpu.models.clip import ClipImageEmbedder, OpenCLIPImageEmbedderPooled

    cfg = CLIPVisionConfig(image_size=32, patch_size=16, width=32, layers=1,
                           heads=4, output_tokens=5, output_dim=12)
    img = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 48, 40, 3)).astype(np.float32))
    for cls_ in (OpenCLIPImageEmbedderPooled, ClipImageEmbedder):
        emb = cls_(cfg, ucg_rate=1.0)
        params = emb.init(jax.random.PRNGKey(0), img)
        z = emb(params, img)  # no key -> no dropout
        assert z.shape == (2, 12) and np.abs(np.asarray(z)).sum() > 0
        zd = emb(params, img, key=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(zd), np.zeros((2, 12), np.float32))
