"""TPU smoke for the persistent trace cache on REAL step programs.

The unit tests (tests/test_progcache.py) validate export/reload on toy
functions; this script proves the same roundtrip on the actual planar and
sphere step programs — Pallas fused kernels (tpu_custom_call payloads),
buffer donation, and the axon remote backend — at a small-but-gate-legal
model size (C=128, ctx=128 passes the %128 tile gates so the Mosaic
kernels are really inside the exported program).

Run it TWICE in separate processes:

    PYTHONPATH=/root/repo:/root/.axon_site python dev/smoke_progcache_tpu.py
    PYTHONPATH=/root/repo:/root/.axon_site python dev/smoke_progcache_tpu.py

First run must print ``[progcache] planar_step exported`` (and sphere);
second must print ``loaded`` for the same keys and the SMOKE hash lines
must match bit-for-bit (both runs execute the identical flattened HLO).
"""

import hashlib
import os
import sys
import time

os.environ.setdefault("DSCALER_TRACE_CACHE_DIR", "/tmp/progcache_smoke")
os.environ.pop("DSCALER_NO_TRACE_CACHE", None)

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    ModelConfig,
    ResamplerConfig,
    UNetConfig,
    VAEConfig,
)
from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.pipelines import i2v, sphere


def small_legal_config() -> ModelConfig:
    """Smallest config that still satisfies the Pallas tile gates
    (C % 128 == 0 at the first level, ctx_dim % 128 == 0)."""
    return ModelConfig(
        unet=UNetConfig(
            model_channels=128,
            num_head_channels=64,
            context_dim=128,
            channel_mult=(1, 2),
            num_res_blocks=1,
            attention_resolutions=(1, 2),
            temporal_length=4,
            use_image_attention=True,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        clip_text=CLIPTextConfig(vocab_size=512, width=128, layers=2, heads=2),
        clip_vision=CLIPVisionConfig(
            image_size=32, patch_size=16, width=128, layers=2, heads=2,
            output_tokens=5,
        ),
        resampler=ResamplerConfig(
            dim=128, depth=1, dim_head=64, heads=2, num_queries=4,
            embedding_dim=128, output_dim=128,
        ),
        dtype="bfloat16",
    )


def main() -> None:
    t0 = time.time()
    print(f"[smoke] backend={jax.default_backend()} devices={jax.devices()}")
    model = LatentVideoDiffusion.init_random(
        small_legal_config(), jax.random.PRNGKey(0), tokenizer=HashTokenizer(512)
    )
    print(f"[smoke] model ready ({time.time() - t0:.1f}s)")

    pano = np.zeros((128, 256, 3), np.float32)
    _, den = i2v.sample_shift_multi_windows(
        model, "smoke", pano, total_w=256, total_h=128, total_f=4,
        num_windows_w=2, num_windows_h=1, loop_step=2,
        height=128, width=128, frames=4, num_inference_steps=2,
        key=jax.random.PRNGKey(3), decode=False,
    )
    h1 = hashlib.sha256(np.asarray(den, np.float32).tobytes()).hexdigest()[:16]
    print(f"[smoke] planar done ({time.time() - t0:.1f}s)")

    pano_s = np.zeros((64, 128, 3), np.float32)
    _, lat, _ = sphere.sample_shift_sphere_panorama(
        model, "smoke", pano_s, equirect_width=128, equirect_height=64,
        phi_theta_dict={0.0: [0.0, 180.0]}, view_fov=110, loop_step_theta=2,
        total_f=4, height=128, width=128, frames=4, num_inference_steps=2,
        paste_on_static=True, key=jax.random.PRNGKey(4),
    )
    h2 = hashlib.sha256(np.asarray(lat, np.float32).tobytes()).hexdigest()[:16]

    # the exported programs must really contain Mosaic kernels — otherwise
    # this smoke isn't testing the risky payload path
    cdir = os.environ["DSCALER_TRACE_CACHE_DIR"]
    n_mosaic = 0
    for fn in os.listdir(cdir):
        if fn.endswith(".dsprog"):
            with open(os.path.join(cdir, fn), "rb") as f:
                if b"tpu_custom_call" in f.read():
                    n_mosaic += 1
    print(f"[smoke] {n_mosaic} cached programs contain tpu_custom_call")
    if jax.default_backend() != "cpu" and n_mosaic == 0:
        print("[smoke] FAIL: no Mosaic payload in any exported program")
        sys.exit(1)

    print(f"SMOKE planar={h1} sphere={h2} total={time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
