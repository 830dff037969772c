"""Full-size converter validation (VERDICT r3 #5).

Instantiates the reference ``UNetModel`` at the REAL VideoCrafter config
(1.44B params — configs/inference_i2v_512_v1.0.yaml:24-51 by default, or
the t2v v2.0 variant with --t2v) with random torch init on CPU, converts
the state dict through ``utils/weights.convert_unet``, and compares one
fp32 forward on a small input. The tiny-config parity tests cover every
layer TYPE; this closes the remaining risk that the 1.44B layout WALK
(level/block enumeration at channel_mult 1/2/4/4, num_res_blocks 2,
attention at ds 1/2/4, openaimodel3d.py:312-708) mis-maps a name at full
scale — previously checked only by param-count equality.

Run (CPU, ~10-25 min on one core, peak ~25 GB):
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python dev/convert_fullsize_check.py
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, "/root/reference")

import torch

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from dynamicscaler_tpu.config import videocrafter2_t2v, videocrafter_i2v
from dynamicscaler_tpu.models.unet3d import UNet3D
from dynamicscaler_tpu.utils import weights as W

REF_PARAMS = dict(  # inference_i2v_512_v1.0.yaml:25-51 / t2v v2.0:24-50
    in_channels=4,
    out_channels=4,
    model_channels=320,
    attention_resolutions=[4, 2, 1],
    num_res_blocks=2,
    channel_mult=[1, 2, 4, 4],
    num_head_channels=64,
    transformer_depth=1,
    context_dim=1024,
    use_linear=True,
    use_checkpoint=False,  # grad checkpointing is a no-op under no_grad
    temporal_conv=True,
    temporal_attention=True,
    temporal_selfatt_only=True,
    use_relative_position=False,
    use_causal_attention=False,
    temporal_length=16,
    addition_attention=True,
    fps_cond=True,
)


def main(t2v: bool):
    from lvdm.modules.networks.openaimodel3d import UNetModel

    kwargs = dict(REF_PARAMS, use_image_attention=not t2v)
    cfg = (videocrafter2_t2v("float32") if t2v else videocrafter_i2v("float32")).unet

    t0 = time.time()
    torch.manual_seed(0)
    m = UNetModel(**kwargs)
    # the reference zero-inits out conv / proj_out / last temporal conv
    # (lvdm/basics.py:19) — random-init outputs would be EXACT ZEROS and the
    # comparison vacuous; give all-zero params small random values
    gen = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for q in m.parameters():
            if (q == 0).all():
                q.add_(torch.randn(q.shape, generator=gen) * 0.02)
    m.eval()
    n_torch = sum(p.numel() for p in m.parameters())
    print(f"[fullsize] torch UNet built: {n_torch:,} params ({time.time()-t0:.0f}s)")

    sd = m.state_dict()
    params = W.convert_unet(sd, cfg)
    n_jax = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"[fullsize] converted: {n_jax:,} params ({time.time()-t0:.0f}s)")
    assert n_torch == n_jax, (n_torch, n_jax)

    # small input, full channel widths: B=1, F=4 frames, 16x16 latent;
    # context 77 text (+16 resampler image tokens for i2v)
    rng = np.random.default_rng(0)
    L = 77 if t2v else 77 + 16
    x = rng.standard_normal((1, 4, 4, 16, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, L, 1024)).astype(np.float32)
    t = np.array([500], np.int64)

    with torch.no_grad():
        ref = m(torch.from_numpy(x), torch.from_numpy(t),
                context=torch.from_numpy(ctx), fps=16).numpy()
    print(f"[fullsize] torch forward done ({time.time()-t0:.0f}s)")
    del m, sd

    model = UNet3D(cfg)  # fp32 compute
    got = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # BCFHW -> BFHWC
        jnp.asarray(t),
        jnp.asarray(ctx),
        16,
    )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    print(f"[fullsize] jax forward done ({time.time()-t0:.0f}s)")

    err = np.abs(got - ref)
    denom = np.maximum(np.abs(ref), 1e-3)
    print(f"[fullsize] max abs err {err.max():.3e}  max rel {np.max(err/denom):.3e}  "
          f"ref std {ref.std():.4f}")
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)
    print(f"[fullsize] PASS — 1.44B-scale convert+forward parity "
          f"({'t2v' if t2v else 'i2v'}) in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--t2v", action="store_true",
                    help="validate the t2v v2.0 config instead of i2v v1.0")
    a = ap.parse_args()
    main(a.t2v)
