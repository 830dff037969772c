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
