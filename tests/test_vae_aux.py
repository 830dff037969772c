"""Parity for the auxiliary (dead-upstream) ae_modules classes.

Oracle = the imported reference classes (lvdm/modules/networks/
ae_modules.py:212-845) at tiny configs with converted weights. Channel
counts are multiples of 32 (GroupNorm(32)).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from dynamicscaler_tpu.config import VAEConfig
from dynamicscaler_tpu.models import vae_aux as A
from dynamicscaler_tpu.utils import weights as W

torch.manual_seed(0)


def _sd(mod):
    return {k: v for k, v in mod.state_dict().items()}


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def _check(got_nhwc, ref_nchw, atol=3e-5):
    np.testing.assert_allclose(
        np.asarray(got_nhwc).transpose(0, 3, 1, 2), ref_nchw.numpy(), atol=atol, rtol=1e-4
    )


@pytest.fixture(scope="module")
def ae():
    from lvdm.modules.networks import ae_modules
    return ae_modules


def test_ddpm_timestep_embedding_parity(ae):
    t = torch.tensor([0, 7, 999])
    ref = ae.get_timestep_embedding(t, 64).numpy()
    got = A.ddpm_timestep_embedding(jnp.asarray(t.numpy()), 64)
    # fp32 sin/cos at arg ~1e3 differ by ~1 ulp(999) ≈ 6e-5 between the
    # torch and XLA libm paths; semantics are identical
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_torch_nearest_resize_parity():
    """size= semantics (what LatentRescaler passes, ae_modules.py:694):
    src = floor(dst * in / out). (scale_factor= would use floor(dst/scale),
    a different torch path no reference call site uses with 'nearest'.)"""
    x = torch.randn(2, 3, 8, 10)
    for factor in (2.0, 1.75, 0.5):
        out_h, out_w = int(round(8 * factor)), int(round(10 * factor))
        ref = torch.nn.functional.interpolate(x, size=(out_h, out_w), mode="nearest")
        got = A.torch_nearest_resize(_nhwc(x.numpy()), out_h, out_w)
        _check(got, ref)


def test_model_parity(ae):
    """ae_modules.py:212-361 — full DDPM UNet with temb + vanilla attn."""
    torch.manual_seed(3)
    ref = ae.Model(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(8,), dropout=0.0, in_channels=3,
                   resolution=16, use_timestep=True).eval()
    cfg = A.AuxModelConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(8,), in_channels=3,
                           resolution=16, use_timestep=True)
    params = W.convert_aux_model(_sd(ref), cfg)

    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([5, 900])
    with torch.no_grad():
        out = ref(x, t)
    got = A.Model(cfg).apply(params, _nhwc(x.numpy()), jnp.asarray(t.numpy()))
    _check(got, out, atol=1e-4)


def test_model_context_concat(ae):
    """:314-316 — context is concatenated along channels before conv_in."""
    torch.manual_seed(4)
    ref = ae.Model(ch=32, out_ch=2, ch_mult=(1,), num_res_blocks=1,
                   attn_resolutions=(), dropout=0.0, in_channels=5,
                   resolution=8, use_timestep=False).eval()
    cfg = A.AuxModelConfig(ch=32, out_ch=2, ch_mult=(1,), num_res_blocks=1,
                           attn_resolutions=(), in_channels=5,
                           resolution=8, use_timestep=False)
    params = W.convert_aux_model(_sd(ref), cfg)
    x = torch.randn(1, 3, 8, 8)
    c = torch.randn(1, 2, 8, 8)
    with torch.no_grad():
        out = ref(x, None, context=c)
    got = A.Model(cfg).apply(params, _nhwc(x.numpy()), None, _nhwc(c.numpy()))
    _check(got, out, atol=1e-4)


def test_simple_decoder_parity(ae):
    torch.manual_seed(5)
    ref = ae.SimpleDecoder(32, 3).eval()
    params = W.convert_simple_decoder(_sd(ref))
    x = torch.randn(1, 32, 6, 6)
    with torch.no_grad():
        out = ref(x)
    got = A.SimpleDecoder(3).apply(params, _nhwc(x.numpy()))
    _check(got, out)


def test_upsample_decoder_parity(ae):
    torch.manual_seed(6)
    ref = ae.UpsampleDecoder(in_channels=32, out_channels=3, ch=32,
                             num_res_blocks=1, resolution=16, ch_mult=(1, 2)).eval()
    params = W.convert_upsample_decoder(_sd(ref), (1, 2), 1)
    x = torch.randn(1, 32, 4, 4)
    with torch.no_grad():
        out = ref(x)
    got = A.UpsampleDecoder(out_channels=3, ch=32, num_res_blocks=1,
                            ch_mult=(1, 2)).apply(params, _nhwc(x.numpy()))
    _check(got, out)


@pytest.mark.parametrize("factor", [2.0, 1.5])
def test_latent_rescaler_parity(ae, factor):
    torch.manual_seed(7)
    ref = ae.LatentRescaler(factor=factor, in_channels=8, mid_channels=32,
                            out_channels=8, depth=1).eval()
    params = W.convert_latent_rescaler(_sd(ref), depth=1)
    x = torch.randn(1, 8, 6, 8)
    with torch.no_grad():
        out = ref(x)
    got = A.LatentRescaler(factor, 32, 8, depth=1).apply(params, _nhwc(x.numpy()))
    _check(got, out)


def test_lin_attn_block_parity(ae):
    torch.manual_seed(8)
    ref = ae.LinAttnBlock(32).eval()
    sd = _sd(ref)
    params = {"params": {"to_qkv": W.conv2d_nb(sd, "to_qkv"),
                         "to_out": W.conv2d(sd, "to_out")}}
    x = torch.randn(2, 32, 5, 6)
    with torch.no_grad():
        out = ref(x)
    got = A.LinAttnBlock().apply(params, _nhwc(x.numpy()))
    _check(got, out, atol=1e-4)


def test_merged_rescale_encoder_parity(ae):
    torch.manual_seed(9)
    ref = ae.MergedRescaleEncoder(in_channels=3, ch=32, resolution=16, out_ch=8,
                                  num_res_blocks=1, attn_resolutions=(),
                                  ch_mult=(1, 2), rescale_factor=1.0,
                                  rescale_module_depth=1).eval()
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, in_channels=3,
                    z_channels=64, double_z=False, attn_resolutions=())
    params = W.convert_merged_rescale_encoder(_sd(ref), cfg, depth=1)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        out = ref(x)
    got = A.MergedRescaleEncoder(cfg, out_ch=8, rescale_factor=1.0,
                                 rescale_module_depth=1).apply(params, _nhwc(x.numpy()))
    _check(got, out)


def test_merged_rescale_decoder_parity(ae):
    torch.manual_seed(10)
    ref = ae.MergedRescaleDecoder(z_channels=16, out_ch=3, resolution=16,
                                  num_res_blocks=1, attn_resolutions=(), ch=32,
                                  ch_mult=(1, 2), rescale_factor=1.0,
                                  rescale_module_depth=1).eval()
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, out_ch=3,
                    z_channels=16, attn_resolutions=())
    params = W.convert_merged_rescale_decoder(_sd(ref), cfg, depth=1)
    x = torch.randn(1, 16, 4, 4)
    with torch.no_grad():
        out = ref(x)
    got = A.MergedRescaleDecoder(cfg, rescale_factor=1.0,
                                 rescale_module_depth=1).apply(params, _nhwc(x.numpy()))
    _check(got, out)


def test_upsampler_parity(ae):
    torch.manual_seed(11)
    ref = ae.Upsampler(in_size=8, out_size=16, in_channels=32, out_channels=3).eval()
    cfg = VAEConfig(z_channels=32, ch=32, ch_mult=(2, 2), num_res_blocks=2, out_ch=3)
    params = W.convert_upsampler(_sd(ref), cfg)
    x = torch.randn(1, 32, 8, 8)
    with torch.no_grad():
        out = ref(x)
    got = A.Upsampler(in_size=8, out_size=16, in_channels=32,
                      out_channels=3).apply(params, _nhwc(x.numpy()))
    _check(got, out)


def test_resize_2d_learned_raises():
    with pytest.raises(NotImplementedError):
        A.resize_2d(jnp.zeros((1, 4, 4, 2)), 2.0, learned=True)
    x = jnp.ones((1, 4, 4, 2))
    assert A.resize_2d(x, 1.0) is x
    assert A.resize_2d(x, 2.0).shape == (1, 8, 8, 2)


def test_first_stage_post_processor_parity(ae):
    torch.manual_seed(12)
    # The reference forward is BROKEN upstream: ae_modules.py:828 references
    # DiagonalGaussianDistribution but the module never imports it (dead
    # code — nothing instantiates FirstStagePostProcessor). Patch the name
    # in to run the oracle.
    if not hasattr(ae, "DiagonalGaussianDistribution"):
        from lvdm.distributions import DiagonalGaussianDistribution
        ae.DiagonalGaussianDistribution = DiagonalGaussianDistribution

    class FakeFirstStage(torch.nn.Module):
        """Identity 'pretrained' stage so forward exercises only the
        projection stack (the real encode is the caller's job here)."""
        def encode(self, x):
            return x

    ref = ae.FirstStagePostProcessor(ch_mult=[1, 2], in_channels=4,
                                     pretrained_model=FakeFirstStage(),
                                     reshape=True, n_channels=32).eval()
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith("pretrained_model")}
    params = W.convert_first_stage_post(sd, (1, 2))
    z = torch.randn(1, 4, 16, 16)
    with torch.no_grad():
        out = ref(z)  # [B, (h w), C]
    got = A.FirstStagePostProcessor(ch_mult=(1, 2), n_channels=32,
                                    do_reshape=True).apply(params, _nhwc(z.numpy()))
    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=3e-5, rtol=1e-4)
