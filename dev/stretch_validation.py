"""Round-2 stretch revalidation on the real chip: the round-1 validated
scenarios (64-frame long-horizon docking, 4K-equirect sampling + ring-tiled
decode) must still hold with on-device masks + unified step programs, plus
the full-size FIFO stream (new per-frame UNet timesteps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/stretch_validation.py [long|4k|fifo]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.config import videocrafter_i2v
from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.pipelines import fifo, i2v


def model_full():
    t0 = time.time()
    m = LatentVideoDiffusion.init_constant(
        videocrafter_i2v(dtype="bfloat16"), tokenizer=HashTokenizer(49408)
    )
    print(f"model {time.time()-t0:.0f}s")
    return m


def run_long(m):
    t0 = time.time()
    pano = np.zeros((512, 1024, 3), np.float32)
    video, den = i2v.sample_shift_multi_windows(
        m, "long", pano, total_w=1024, total_h=512, total_f=64,
        num_windows_w=2, num_windows_h=2, loop_step=16,
        height=320, width=512, frames=16, num_inference_steps=33,
        dock_at_f=True, loop_step_frame=8,
        merge_prev_denoised_ratio_list=[0.5] * 33,
        key=jax.random.PRNGKey(0), decode=True,
    )
    v = np.asarray(video)
    assert v.shape == (1, 64, 512, 1024, 3), v.shape
    assert np.isfinite(v).all()
    print(f"long-horizon 64f OK in {time.time()-t0:.0f}s, shape {v.shape}")


def run_4k(m):
    t0 = time.time()
    pano = np.zeros((2048, 4096, 3), np.float32)
    video, den = i2v.sample_shift_multi_windows(
        m, "4k", pano, total_w=4096, total_h=2048, total_f=16,
        num_windows_w=8, num_windows_h=8, loop_step=4,
        height=320, width=512, frames=16, num_inference_steps=4,
        key=jax.random.PRNGKey(0), decode=False,
    )
    d = np.asarray(den)
    assert d.shape == (1, 16, 256, 512, 4), d.shape
    assert np.isfinite(d).all()
    print(f"4K sampling OK in {time.time()-t0:.0f}s")
    t1 = time.time()
    from dynamicscaler_tpu.pipelines.tiled_vae import ring_aware_decode

    frames2 = ring_aware_decode(m, jnp.asarray(d[:, :2]), w_tiles=4)
    f = np.asarray(frames2)
    assert f.shape == (1, 2, 2048, 4096, 3) and np.isfinite(f).all()
    print(f"4K ring-tiled decode (2 frames) OK in {time.time()-t1:.0f}s")


def run_fifo(m):
    t0 = time.time()
    _, stream = fifo.fifo_sample(
        m, "endless ocean", num_output_frames=32, height=320, width=512,
        frames=16, key=jax.random.PRNGKey(0), decode=False,
    )
    s = np.asarray(stream)
    assert s.shape == (1, 32, 40, 64, 4), s.shape
    assert np.isfinite(s).all()
    print(f"FIFO 32-frame full-size stream OK in {time.time()-t0:.0f}s "
          f"(per-frame t, 1 UNet call/frame)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["fifo", "long", "4k"]
    m = model_full()
    for w in which:
        {"long": run_long, "4k": run_4k, "fifo": run_fifo}[w](m)
