"""Exponential-moving-average parameter shadowing.

Functional JAX counterpart of the reference's ``LitEma`` module
(lvdm/ema.py:5-75): a shadow copy of the parameter tree updated as

    decay_t = min(decay, (1 + t) / (10 + t))            # warmup ramp
    shadow  = shadow - (1 - decay_t) * (shadow - param)  # ema.py:35-44

Where torch LitEma is a stateful nn.Module holding shadow *buffers* plus a
``store``/``restore`` swap for the ``ema_scope`` context (ddpm3d.py:167-180),
here the state is an immutable pytree — "store/restore" is just keeping the
original tree, and ``ema_scope`` inference equals running with
``EmaState.shadow``. The checkpoint converter already resolves persisted
``model_ema.*`` shadow buffers (utils/weights.py ``prefer_ema``); this module
supplies the *update* half so a training/fine-tuning loop on TPU can
maintain the same statistics.

All ops are pure jnp and jit/pmap-safe; the update is a single fused
elementwise pass over the tree (no per-name Python loop like torch's
``named_parameters`` walk, ema.py:31-44 — XLA fuses the whole tree).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EmaState:
    shadow: Any  # pytree matching params (the reference's m_name2s_name
    #              buffer map collapses to structural identity here)
    num_updates: jnp.ndarray  # int32 scalar; -1 disables warmup like
    #              use_num_upates=False in ema.py:16-19
    decay: float = flax.struct.field(pytree_node=False, default=0.9999)


def ema_init(params, decay: float = 0.9999, use_num_updates: bool = True) -> EmaState:
    """ema.py:5-23 — shadow starts as a copy of the live parameters."""
    assert 0.0 <= decay <= 1.0, decay
    return EmaState(
        shadow=jax.tree.map(jnp.asarray, params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        decay=decay,
    )


def ema_update(state: EmaState, params) -> EmaState:
    """One EMA step (ema.py:25-46 ``forward``). Pure; jit-compatible."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        n >= 0,
        jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)),
        state.decay,
    )
    one_minus = (1.0 - decay).astype(jnp.float32)

    def upd(s, p):
        sf = s.astype(jnp.float32)
        return (sf - one_minus * (sf - p.astype(jnp.float32))).astype(s.dtype)

    return EmaState(
        shadow=jax.tree.map(upd, state.shadow, params),
        num_updates=n,
        decay=state.decay,
    )


def ema_params(state: EmaState):
    """The averaged tree — what ``copy_to`` (ema.py:48-55) writes into the
    live model inside ``ema_scope``; functionally, just use this tree."""
    return state.shadow
