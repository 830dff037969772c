"""Parity for the alternate text encoders (models/encoders_alt.py) against
the transformers implementations the reference wraps (condition.py:57-135,
377-392), at tiny random-init configs on CPU."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dynamicscaler_tpu.models import encoders_alt as EA
from dynamicscaler_tpu.utils import weights as W

transformers = pytest.importorskip("transformers")


def _tiny_hf_clip():
    from transformers import CLIPTextConfig, CLIPTextModel

    tcfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        # openai/clip-vit-large-patch14 ships the legacy eos_token_id=2,
        # which selects transformers' argmax(ids) pooling path — the one
        # HFCLIPTextEncoder implements (condition.py:98 wraps that model)
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = CLIPTextModel(tcfg).eval()
    cfg = EA.HFCLIPTextConfig(
        vocab_size=99, width=32, layers=3, heads=4, mlp_width=64,
        context_length=16,
    )
    return m, cfg


def _tokens(vocab, L=16, B=2, seed=1):
    rng = np.random.default_rng(seed)
    t = rng.integers(1, vocab - 1, (B, L))
    t[:, -1] = vocab - 1  # EOT = max vocab id (HF argmax pooling contract)
    return t.astype(np.int32)


@pytest.mark.parametrize("layer,layer_idx", [("last", None), ("pooled", None),
                                             ("hidden", 1), ("hidden", -1)])
def test_hf_clip_text_parity(layer, layer_idx):
    m, cfg = _tiny_hf_clip()
    cfg = EA.HFCLIPTextConfig(**{**cfg.__dict__, "layer": layer, "layer_idx": layer_idx})
    toks = _tokens(cfg.vocab_size)
    with torch.no_grad():
        out = m(input_ids=torch.from_numpy(toks.astype(np.int64)),
                output_hidden_states=layer == "hidden")
    if layer == "last":
        ref = out.last_hidden_state.numpy()
    elif layer == "pooled":
        ref = out.pooler_output[:, None, :].numpy()
    else:
        ref = out.hidden_states[layer_idx].numpy()

    params = W.convert_hf_clip_text(m.state_dict(), cfg)
    got = np.asarray(EA.HFCLIPTextEncoder(cfg).apply(params, jnp.asarray(toks)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def _tiny_t5():
    from transformers import T5Config, T5EncoderModel

    tcfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    m = T5EncoderModel(tcfg).eval()
    cfg = EA.T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
    )
    return m, cfg


def test_t5_encoder_parity():
    m, cfg = _tiny_t5()
    toks = _tokens(cfg.vocab_size, L=13, seed=3)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(toks.astype(np.int64))).last_hidden_state.numpy()
    params = W.convert_t5_encoder(m.state_dict(), cfg)
    got = np.asarray(EA.T5TextEncoder(cfg).apply(params, jnp.asarray(toks)))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_t5_bucket_table_matches_transformers():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = torch.arange(17)[None, :] - torch.arange(17)[:, None]
    ref = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=8, max_distance=20
    ).numpy()
    got = EA.t5_position_bucket_table(
        17, EA.T5Config(relative_attention_num_buckets=8,
                        relative_attention_max_distance=20)
    )
    np.testing.assert_array_equal(got, ref)


def test_clip_t5_pair():
    mc, ccfg = _tiny_hf_clip()
    mt, tcfg = _tiny_t5()
    pair = EA.CLIPT5TextEncoder(ccfg, tcfg)
    params = {
        "clip": W.convert_hf_clip_text(mc.state_dict(), ccfg),
        "t5": W.convert_t5_encoder(mt.state_dict(), tcfg),
    }
    ct = _tokens(ccfg.vocab_size)
    tt = _tokens(tcfg.vocab_size, L=13)
    clip_z, t5_z = pair(params, jnp.asarray(ct), jnp.asarray(tt))
    with torch.no_grad():
        ref_c = mc(input_ids=torch.from_numpy(ct.astype(np.int64))).last_hidden_state.numpy()
        ref_t = mt(input_ids=torch.from_numpy(tt.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(clip_z), ref_c, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t5_z), ref_t, atol=3e-5, rtol=1e-4)


def test_class_embedder_semantics():
    """condition.py:23-47 behavioral contract (RNG differs from torch's
    global bernoulli, so semantics — not bits — are asserted)."""
    import jax

    from dynamicscaler_tpu.models.encoders_alt import (
        ClassEmbedder, ClassEmbedderConfig)

    cfg = ClassEmbedderConfig(embed_dim=8, n_classes=10)
    m = ClassEmbedder(cfg, ucg_rate=1.0)  # always drop
    labels = jnp.arange(6)
    p = m.init(jax.random.PRNGKey(0), labels)
    table = np.asarray(p["params"]["embedding"])

    # no key / disable_dropout: plain lookup, crossattn-shaped [B, 1, D]
    out = np.asarray(m.apply(p, labels))
    assert out.shape == (6, 1, 8)
    np.testing.assert_array_equal(out[:, 0], table[:6])
    out2 = np.asarray(m.apply(p, labels, key=jax.random.PRNGKey(1),
                              disable_dropout=True))
    np.testing.assert_array_equal(out2, out)

    # ucg_rate=1: every row becomes the reserved last class
    dropped = np.asarray(m.apply(p, labels, key=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(dropped[:, 0], np.tile(table[9], (6, 1)))

    uc = ClassEmbedder.unconditional_labels(cfg, 4)
    assert uc.shape == (4,) and int(uc[0]) == 9
