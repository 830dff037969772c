"""EMA update parity vs the reference LitEma (lvdm/ema.py) as torch oracle."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.ema import ema_init, ema_params, ema_update

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


class _TinyTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.lin = torch.nn.Linear(4, 3)
        self.emb = torch.nn.Embedding(5, 4)


def _params_of(mod):
    # np.array COPY is load-bearing: CPU JAX zero-copies numpy views, and
    # tensor.numpy() aliases torch storage — in-place p.add_ would silently
    # mutate the "captured" tree
    return {n: jnp.asarray(np.array(p.detach().numpy()))
            for n, p in mod.named_parameters()}


@pytest.mark.parametrize("use_num_updates", [True, False])
def test_ema_update_matches_litema(use_num_updates):
    from lvdm.ema import LitEma

    torch.manual_seed(0)
    mod = _TinyTorch()
    ema = LitEma(mod, decay=0.999, use_num_upates=use_num_updates)
    state = ema_init(_params_of(mod), decay=0.999, use_num_updates=use_num_updates)

    gen = torch.Generator().manual_seed(1)
    for step in range(5):
        with torch.no_grad():
            for p in mod.parameters():
                p.add_(torch.randn(p.shape, generator=gen) * 0.1)
        ema(mod)
        state = ema_update(state, _params_of(mod))

    sd = dict(ema.named_buffers())
    ours = ema_params(state)
    for name in _params_of(mod):
        s_name = ema.m_name2s_name[name]
        ref = sd[s_name].numpy()
        got = np.asarray(ours[name])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, err_msg=name)
    assert int(state.num_updates) == (5 if use_num_updates else -1)


def test_ema_update_is_jittable():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = ema_init(params, decay=0.5)
    step = jax.jit(ema_update)
    new_params = {"w": jnp.full((4, 4), 2.0), "b": jnp.ones((4,))}
    for _ in range(3):
        state = step(state, new_params)
    # after 3 warmup steps decay_t = min(.5, t/(9+t)) ramps; shadow moved
    # strictly toward the new params but not all the way
    w = np.asarray(ema_params(state)["w"])
    assert 1.0 < w.min() <= w.max() < 2.0
