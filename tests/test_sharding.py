"""Mesh sharding correctness: the sharded window-batch program must produce
the same results as single-device execution (8 virtual CPU devices)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    window_sharding,
    latent_sharding,
)
from dynamicscaler_tpu.pipelines import t2v


@pytest.fixture(scope="module")
def model():
    return LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_seq=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "seq")
    full = make_mesh()
    assert full.devices.shape == (8, 1)


def test_sharded_matches_unsharded(model):
    kwargs = dict(
        num_windows_w=4, num_windows_h=2, height=32, width=32, frames=4,
        num_inference_steps=2, loop_step=2, decode=False,
        key=jax.random.PRNGKey(3),
    )
    _, ref = t2v.sample_shift_multi_windows(model, "x", **kwargs)

    mesh = make_mesh(n_data=4, n_seq=2)
    sharded_model = LatentVideoDiffusion(
        config=model.config, params=replicate(model.params, mesh),
        tokenizer=model.tokenizer,
    )
    _, got = t2v.sample_shift_multi_windows(sharded_model, "x", mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_window_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((8, 4, 8, 8, 4))
    xs = jax.device_put(x, window_sharding(mesh))
    # 8 windows over 8 devices: each shard holds one window
    assert xs.sharding.shard_shape(x.shape)[0] == 1

    lat = jnp.zeros((1, 4, 16, 32, 4))
    mesh2 = make_mesh(n_data=4, n_seq=2)
    ls = jax.device_put(lat, latent_sharding(mesh2))
    # W axis split over seq=2
    assert ls.sharding.shard_shape(lat.shape)[3] == 16
