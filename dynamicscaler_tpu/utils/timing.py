"""Env-gated wall-clock instrumentation for the sampler loops.

``DSCALER_STEP_TIMING=1`` prints cumulative setup marks and per-step laps
(with a device sync so laps measure real completion, not async dispatch).
Zero overhead when the env var is unset.
"""

from __future__ import annotations

import os
import time


def _enabled() -> bool:
    return bool(os.environ.get("DSCALER_STEP_TIMING"))


class Marker:
    """Prints `[tag] name: Xs cum` marks and `[tag] label Xs` laps."""

    def __init__(self, tag: str):
        self.tag = tag
        self.on = _enabled()
        self.t0 = time.perf_counter()
        self.last = self.t0

    def _sync(self, block):
        if block is not None:
            import jax

            jax.block_until_ready(block)

    def mark(self, name: str, block=None) -> None:
        """Cumulative-since-construction mark (setup phases)."""
        if not self.on:
            return
        self._sync(block)
        print(f"[{self.tag}] {name}: {time.perf_counter() - self.t0:.2f}s cum",
              flush=True)
        self.last = time.perf_counter()

    def lap(self, label: str, block=None) -> None:
        """Delta-since-last-lap mark (per-step timing)."""
        if not self.on:
            return
        self._sync(block)
        now = time.perf_counter()
        print(f"[{self.tag}] {label} {now - self.last:.2f}s", flush=True)
        self.last = now

    def reset_lap(self) -> None:
        self.last = time.perf_counter()


class LoopStats:
    """Steady-state rate of the most recent sampler step loop.

    Wall-clock totals through the axon tunnel carry a 0.4-25s/RPC lottery
    on setup (BENCH_NOTES.md); the chip-bound steady rate is the stable
    cross-run metric. ``mark_first`` blocks on the first step's output
    (excluding compile + program load), ``finish`` blocks on the last —
    two scalar readbacks per loop. Read by gen_pano_360's e2e artifact.
    """

    def __init__(self):
        self.steps = 0
        self.steady_sec_per_step = None
        self._t = None

    def start(self, n_steps: int) -> None:
        self.steps = int(n_steps)
        self.steady_sec_per_step = None
        self._t = None

    @staticmethod
    def _readback(arr) -> None:
        import jax.numpy as jnp

        float(jnp.sum(arr.astype(jnp.float32)))

    def mark_first(self, arr) -> None:
        self._readback(arr)
        self._t = time.perf_counter()

    def finish(self, arr) -> None:
        if self._t is None or self.steps < 2:
            return
        self._readback(arr)
        self.steady_sec_per_step = (time.perf_counter() - self._t) / (self.steps - 1)
