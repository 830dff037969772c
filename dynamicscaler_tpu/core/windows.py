"""Shift-window grid arithmetic (host-side, pure Python).

Replicates the reference's per-step window enumeration exactly so the jitted
step programs receive precomputed origin arrays:

* frame windows with cyclic start offset, per-step overlap ratio and
  start/end docking (i2v_sphere_panorama_pipeline.py:256-318, 786-854);
* planar W/H windows on an integer grid (i2v_normal_pipeline.py:254-313)
  or with fractional overlap derived from total size
  (i2v_sphere_panorama_pipeline.py:732-760);
* sphere view grids with per-step theta offset
  (i2v_sphere_panorama_pipeline.py:235, gen_pano_360.py:444-455).

Window *counts* vary only over a finite set of step phases, so each count
compiles one XLA program; origins are data.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

DOCK_START = "dock_start"
DOCK_END = "dock_end"


# ---------------------------------------------------------------------------
# Frame (temporal) windows
# ---------------------------------------------------------------------------


def frame_window_origins(
    step: int,
    total_f: int,
    frames: int,
    overlap_ratio_f: float,
    loop_step_frame: Optional[int] = None,
    dock_at_f: bool = False,
) -> List[int]:
    """Frame-window start indices for DDIM step ``step``.

    Mirrors i2v_sphere_panorama_pipeline.py:256-318: cyclic start offset
    ``(i % loop_step_frame) * offset_shift_step_size_f``, ``ceil`` window
    count over the ring, optional docking windows pinned to clip start/end
    (skipped when the cycle is at origin or the window would cross the end).
    """
    if total_f == frames:
        return [0]
    if total_f < frames:
        raise ValueError(f"total_f {total_f} must be >= frames {frames}")

    total_window_num_f = math.ceil((total_f // frames - 1) / (1 - overlap_ratio_f)) + 1
    offset_step = max(int(overlap_ratio_f * frames / loop_step_frame), 1)
    begin = (step % loop_step_frame) * offset_step

    idx_list: List = list(range(total_window_num_f))
    if dock_at_f:
        idx_list = [DOCK_START] + idx_list + [DOCK_END]

    origins: List[int] = []
    stride = int(frames * (1 - overlap_ratio_f))
    for idx in idx_list:
        if idx == DOCK_START:
            if begin == 0:
                continue
            f0 = 0
        elif idx == DOCK_END:
            if begin == 0:
                continue
            f0 = total_f - frames
        else:
            f0 = (begin + idx * stride) % total_f
        if dock_at_f and f0 + frames > total_f:
            # docking mode never wraps past the clip end (reference skips)
            continue
        origins.append(f0)
    return origins


# ---------------------------------------------------------------------------
# Planar spatial windows
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PlanarGrid:
    """Fractional-overlap planar window grid over a [total_h, total_w]
    latent with [win_h, win_w] windows (sphere-pipeline planar variant,
    i2v_sphere_panorama_pipeline.py:732-768)."""

    total_h: int
    total_w: int
    win_h: int
    win_w: int
    num_windows_h: int
    num_windows_w: int
    loop_step: int
    vae_scale: int = 8

    def __post_init__(self):
        for name in ("overlap_ratio_w", "overlap_ratio_h"):
            r = getattr(self, name)
            assert 0 <= r < 1, f"{name}={r} not legal for grid {self}"
        # windows must be able to cover the full extent (the reference's
        # nw==1 case divides by zero; we require exact fit instead)
        if self.num_windows_w == 1:
            assert self.total_w == self.win_w, (
                f"1 window of w={self.win_w} cannot cover total_w={self.total_w}"
            )
        if self.num_windows_h == 1:
            assert self.total_h == self.win_h, (
                f"1 window of h={self.win_h} cannot cover total_h={self.total_h}"
            )
        if self.num_windows_w > 1:
            assert self.offset_step_w >= 1, "latent_offset_step_size_w should >= 1"
        if self.num_windows_h > 1:
            assert self.offset_step_h >= 1, "latent_offset_step_size_h should >= 1"

    # fractional overlap from total size (reference computes in image pixels;
    # ratios are identical in latent units)
    @property
    def overlap_ratio_w(self) -> float:
        if self.num_windows_w == 1:
            return 0.0
        return 1 - (self.total_w / self.win_w - 1) / (self.num_windows_w - 1)

    @property
    def overlap_ratio_h(self) -> float:
        if self.num_windows_h == 1:
            return 0.0
        return 1 - (self.total_h / self.win_h - 1) / (self.num_windows_h - 1)

    @property
    def window_step_w(self) -> float:
        return self.win_w * (1 - self.overlap_ratio_w)

    @property
    def window_step_h(self) -> float:
        return self.win_h * (1 - self.overlap_ratio_h)

    @property
    def offset_step_w(self) -> int:
        if self.num_windows_w == 1:
            return 0
        # image_offset_step_size_w // vae_scale (reference works in pixels)
        img_w = self.win_w * self.vae_scale
        return int((1 - self.overlap_ratio_w) * img_w / self.loop_step) // self.vae_scale

    @property
    def offset_step_h(self) -> int:
        if self.num_windows_h == 1:
            return 0
        img_h = self.win_h * self.vae_scale
        return int((1 - self.overlap_ratio_h) * img_h / self.loop_step) // self.vae_scale

    def step_origins(self, step: int, begin_index_offset: int = 0) -> List[Tuple[int, int]]:
        """(h0, w0) latent origins for every (h, w) window at DDIM ``step``."""
        phase = (step + begin_index_offset) % self.loop_step
        left0 = phase * self.offset_step_w
        top0 = phase * self.offset_step_h
        out = []
        for wi in range(self.num_windows_w):
            for hi in range(self.num_windows_h):
                w0 = left0 + round(wi * self.window_step_w)
                h0 = top0 + round(hi * self.window_step_h)
                out.append((h0, w0))
        return out


@dataclasses.dataclass(frozen=True)
class IntegerGrid:
    """Integer-grid variant: total = window * num_windows, step offsets in
    whole latent pixels (i2v_normal_pipeline.py:254-313,
    t2v_normal_pipeline.py). Includes optional H docking (pin top/bottom
    rows) and odd-step half-period jumps (t2v ``shift_jump_odd``)."""

    win_f: int
    win_h: int
    win_w: int
    num_windows_f: int
    num_windows_h: int
    num_windows_w: int
    loop_step: int
    dock_at_h: bool = False
    shift_jump_odd_w: bool = False
    shift_jump_odd_h: bool = False
    shift_jump_odd_f: bool = False
    # t2v-style per-axis docking active only on steps in docking_step_range
    # (t2v_normal_pipeline.py:481-522). NOTE: the reference's shift_jump_odd_h
    # shifts the *left* offset and _w shifts *top* (swapped-axis bug at
    # t2v_normal_pipeline.py:471-476); we apply each jump to its own axis.
    docking_w: bool = False
    docking_h: bool = False
    docking_f: bool = False
    docking_step_range: Optional[Tuple[int, ...]] = None

    @property
    def total_f(self):
        return self.win_f * self.num_windows_f

    @property
    def total_h(self):
        return self.win_h * self.num_windows_h

    @property
    def total_w(self):
        return self.win_w * self.num_windows_w

    def _offset(self, step: int, size: int, jump_odd: bool) -> int:
        base = (step % self.loop_step) * (size // self.loop_step)
        if jump_odd and step % 2 == 1:
            base = (base + size // 2) % size
        return base

    def step_origins(self, step: int) -> List[Tuple[int, int, int]]:
        """(f0, h0, w0) origins for all windows at ``step`` (+ dock rows)."""
        off_f = self._offset(step, self.win_f, self.shift_jump_odd_f) if self.num_windows_f > 1 else 0
        off_h = self._offset(step, self.win_h, self.shift_jump_odd_h) if self.num_windows_h > 1 else 0
        off_w = self._offset(step, self.win_w, self.shift_jump_odd_w) if self.num_windows_w > 1 else 0
        dock_now = (
            self.docking_step_range is not None and step in self.docking_step_range
        )

        def axis_positions(n, win, total, off, docking):
            """Window start positions along one axis, in reference loop
            order. On docking steps (t2v_normal_pipeline.py:481-522) the
            docked axis prepends a window pinned to 0 and REPLACES its last
            window with one pinned to the far edge."""
            pos = [off + i * win for i in range(n)]
            if docking and dock_now and n > 1:
                pos = [0] + pos[:-1] + [total - win]
            return pos

        fs = axis_positions(self.num_windows_f, self.win_f, self.total_f, off_f, self.docking_f)
        ws = axis_positions(self.num_windows_w, self.win_w, self.total_w, off_w, self.docking_w)
        hs = axis_positions(self.num_windows_h, self.win_h, self.total_h, off_h, self.docking_h)

        origins = []
        # reference iteration order: f outer, then w, then h (h innermost) —
        # order matters for last-write-wins overlap (i2v_normal_pipeline.py:254)
        for f0 in fs:
            for w0 in ws:
                for h0 in hs:
                    origins.append((f0, h0, w0))

        if self.dock_at_h and off_h != 0 and self.num_windows_h > 1:
            # pin top and bottom edges (i2v_normal_pipeline.py:275-313)
            for f0 in fs:
                for w0 in ws:
                    origins.append((f0, 0, w0))
                    origins.append((f0, self.total_h - self.win_h, w0))
        return origins


# ---------------------------------------------------------------------------
# Sphere view grids
# ---------------------------------------------------------------------------


def default_phi_theta_grid(phi_num: int = 6) -> Dict[float, List[float]]:
    """The gen_pano_360.py:444-455 view grid: equator ring of ``phi_num``
    thetas at phi 0, +-45 / +-67.5 rings, poles."""
    thetas = [i * (360.0 / phi_num) for i in range(phi_num)]
    return {
        -90.0: [0.0],
        -67.5: thetas,
        -45.0: thetas,
        0.0: thetas,
        45.0: thetas,
        67.5: thetas,
        90.0: [0.0],
    }


def sphere_step_views(
    phi_theta_dict: Dict[float, Sequence[float]],
    step: int,
    loop_step_theta: int,
    view_fov: float,
) -> List[Tuple[float, float]]:
    """(phi, theta+offset) pairs for DDIM ``step``
    (i2v_sphere_panorama_pipeline.py:235,320-327)."""
    theta_offset = (step % loop_step_theta) * (view_fov // loop_step_theta)
    out = []
    for phi, thetas in phi_theta_dict.items():
        for theta in thetas:
            out.append((phi, theta + theta_offset))
    return out


def sphere_phase_views(
    phi_theta_dict: Dict[float, Sequence[float]],
    loop_step_theta: int,
    view_fov: float,
) -> Dict[int, List[Tuple[float, float]]]:
    """All distinct step phases -> view lists (finite set; index maps and
    CLIP conds are precomputed per phase)."""
    return {
        p: sphere_step_views(phi_theta_dict, p, loop_step_theta, view_fov)
        for p in range(loop_step_theta)
    }
