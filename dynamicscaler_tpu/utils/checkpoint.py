"""Parameter + stage checkpointing via orbax.

The reference reads torch state_dicts every launch (ddpm3d.py:182-198) and
torch.saves stage latents. Here: converted params are cached once as an
orbax checkpoint (subsequent launches skip the torch conversion entirely),
and stage latents use .npy (utils/io.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict


def save_params(params: Dict[str, Any], path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_or_convert(ckpt_path: str, config, cache_dir: str = None) -> Dict[str, Any]:
    """Load params from the orbax cache next to the torch ckpt, converting
    (and caching) on first use."""
    cache = cache_dir or (ckpt_path + ".orbax")
    if os.path.isdir(cache):
        return load_params(cache)
    from dynamicscaler_tpu.utils.weights import load_videocrafter_checkpoint

    params = load_videocrafter_checkpoint(ckpt_path, config)
    try:
        save_params(params, cache)
    except Exception as e:  # cache failure is non-fatal
        print(f"[checkpoint] orbax cache write failed ({e}); continuing uncached")
    return params
