"""Isolate stage-1 timing: setup vs per-step device time."""
import time
import numpy as np
import jax, jax.numpy as jnp
from dynamicscaler_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.config import videocrafter_i2v
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.pipelines import sphere

t0 = time.time()
model = LatentVideoDiffusion.init_constant(videocrafter_i2v(dtype="bfloat16"),
                                           tokenizer=HashTokenizer(49408))
print(f"model build {time.time()-t0:.1f}s")

pano = np.zeros((1024, 2048, 3), np.float32)
thetas = [360 * t // 6 for t in range(6)]
ptd = {90: [0], -90: [0], 75: thetas, -75: thetas, 60: thetas, -60: thetas,
       45: thetas, -45: thetas, 0: thetas}

import dynamicscaler_tpu.pipelines.sphere as sp
_orig_fn = sp._sphere_step
t1 = time.time()
for steps in (15,):
    video, lat, den = sphere.sample_shift_sphere_panorama(
        model, "x", pano, equirect_width=2048, equirect_height=1024,
        phi_theta_dict=ptd, view_fov=120, loop_step_theta=10,
        denoise_to_step=steps, num_inference_steps=48,
        merge_prev_denoised_ratio_list=[0.5] * 48,
        key=jax.random.PRNGKey(0), decode=False, unet_microbatch=8,
    )
    float(jnp.sum(den.astype(jnp.float32)))
    print(f"{steps} steps: {time.time()-t1:.1f}s total since setup")
