"""Multi-host (DCN) process-group initialization.

TPU-native equivalent of the reference's NCCL bring-up — ``setup_dist``
(utils/utils.py:99-106, ``dist.init_process_group('nccl', init_method=
'env://')``) and the DDP launcher (scripts/evaluation/ddp_wrapper.py:8-12,
which derives rank/world from the env and pins a GPU per process). On TPU
one ``jax.distributed.initialize`` call plays that role: afterwards
``jax.process_index()/process_count()`` report this process's rank/world,
``jax.devices()`` spans every host's chips, and any collective a sharded
program needs rides DCN between hosts (ICI within one).

Like the reference, initialization is opt-in and the single-process default
needs no coordination at all. Flag precedence mirrors ddp_wrapper: explicit
CLI flags, then the standard launcher env (``DSCALER_COORDINATOR`` /
``DSCALER_NUM_PROCESSES`` / ``DSCALER_PROCESS_ID``), else no-op.
"""

from __future__ import annotations

import os
from typing import Optional


def add_distributed_flags(parser) -> None:
    """Attach the multi-host flags to an argparse parser."""
    parser.add_argument(
        "--coordinator", type=str, default="",
        help="host:port of process 0; presence turns on multi-host init "
             "(reference env:// init_method equivalent)")
    parser.add_argument("--num_processes", type=int, default=-1,
                        help="total process count (reference world_size)")
    parser.add_argument("--process_id", type=int, default=-1,
                        help="this process's rank (reference local rank)")


def initialize_distributed(
    coordinator: str = "",
    num_processes: int = -1,
    process_id: int = -1,
) -> bool:
    """Call ``jax.distributed.initialize`` when multi-host flags/env are
    present. Returns True iff a process group was initialized. Must run
    before the first JAX backend touch (same ordering rule as torch's
    ``init_process_group`` before the first CUDA op)."""
    coordinator = coordinator or os.environ.get("DSCALER_COORDINATOR", "")
    if not coordinator:
        return False
    if num_processes < 0:
        num_processes = int(os.environ.get("DSCALER_NUM_PROCESSES", "-1"))
    if process_id < 0:
        process_id = int(os.environ.get("DSCALER_PROCESS_ID", "-1"))
    assert num_processes > 0 and process_id >= 0, (
        "multi-host init needs --num_processes and --process_id along with "
        "--coordinator (ddp_wrapper.py:8-12 reads the same trio from env)")
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def initialize_from_args(args) -> bool:
    return initialize_distributed(
        getattr(args, "coordinator", ""),
        getattr(args, "num_processes", -1),
        getattr(args, "process_id", -1),
    )


def barrier(name: str = "dscaler") -> None:
    """Cross-process rendezvous (proves DCN coordination actually works;
    the reference had no equivalent — NCCL init itself was its only sync)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
