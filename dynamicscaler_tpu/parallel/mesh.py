"""Device mesh + sharding for multi-window denoising.

The reference's only parallelism is NCCL data-parallel over *prompts*
(scripts/evaluation/ddp_wrapper.py:8-46). On TPU the natural unit is the
**window**: every window of a DDIM step is an independent UNet call
(SURVEY §3.2), so the CFG-packed window batch is sharded over the mesh
``data`` axis and XLA/GSPMD inserts the collectives (all-gather of scattered
results over ICI). The global pano latent additionally carries a ``seq``
axis sharding along W (the ring axis maps 1:1 onto a ring mesh) so scatter
/ blend phases of very large panoramas are distributed too.

Design follows the annotate-and-let-XLA-partition recipe: a ``Mesh``, a
few ``with_sharding_constraint`` anchors at program boundaries, no manual
collectives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices=None,
) -> Mesh:
    """Mesh with ('data', 'seq') axes; defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_seq
    arr = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [N, f, h, w, C] window batch: N over 'data'."""
    return NamedSharding(mesh, P("data"))


def latent_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the global [B, F, H, W, C] pano latent: W over 'seq'
    (the ring axis; wrap-around halos ride ICI ring permutes)."""
    return NamedSharding(mesh, P(None, None, None, "seq", None))


def constrain_window_batch(x, mesh: Optional[Mesh]):
    """Anchor: shard the leading (window-batch) axis over 'data'."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, window_sharding(mesh))


def constrain_latent(x, mesh: Optional[Mesh]):
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, latent_sharding(mesh))


def replicate(tree, mesh: Optional[Mesh]):
    """Place params replicated on the mesh (frozen model weights)."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
