"""Window-grid arithmetic vs direct re-implementation of the reference's
loop logic (i2v_sphere_panorama_pipeline.py:256-318,732-854)."""

import math

import numpy as np
import pytest

from dynamicscaler_tpu.core.windows import (
    DOCK_END,
    DOCK_START,
    IntegerGrid,
    PlanarGrid,
    default_phi_theta_grid,
    frame_window_origins,
    sphere_phase_views,
    sphere_step_views,
)


def reference_frame_windows(i, total_f, frames, overlap_ratio_f, loop_step_frame, dock_at_f):
    """Literal transcription of the reference's frame-window control flow."""
    if total_f == frames:
        return [0]
    total_window_num_f = math.ceil((total_f // frames - 1) / (1 - overlap_ratio_f)) + 1
    offset_shift = max(int(overlap_ratio_f * frames / loop_step_frame), 1)
    begin = (i % loop_step_frame) * offset_shift
    idx_list = list(range(total_window_num_f))
    if dock_at_f:
        idx_list = ["S"] + idx_list + ["E"]
    out = []
    for idx in idx_list:
        if idx == "S":
            if begin == 0:
                continue
            b, e = 0, frames
        elif idx == "E":
            if begin == 0:
                continue
            b, e = total_f - frames, total_f
        else:
            b = (begin + idx * int(frames * (1 - overlap_ratio_f))) % total_f
            e = b + frames
        if dock_at_f and e > total_f:
            continue
        out.append(b)
    return out


@pytest.mark.parametrize("total_f,frames,ov,lsf,dock", [
    (16, 16, 0.75, 8, True),
    (64, 16, 0.75, 8, True),
    (64, 16, 0.5, 8, True),
    (32, 16, 0.5, 4, False),
    (48, 16, 0.25, 8, True),
])
def test_frame_windows_match_reference(total_f, frames, ov, lsf, dock):
    for i in range(12):
        got = frame_window_origins(i, total_f, frames, ov, lsf, dock)
        ref = reference_frame_windows(i, total_f, frames, ov, lsf, dock)
        assert got == ref, (i, got, ref)


def test_planar_grid_matches_reference_formulas():
    # gen_pano stage 2 defaults: total 1024x512 px, window 512x320, 2x2
    g = PlanarGrid(total_h=64, total_w=128, win_h=40, win_w=64,
                   num_windows_h=2, num_windows_w=2, loop_step=16, vae_scale=8)
    ov_w = 1 - (1024 / 512 - 1) / (2 - 1)
    ov_h = 1 - (512 / 320 - 1) / (2 - 1)
    assert abs(g.overlap_ratio_w - ov_w) < 1e-9
    assert abs(g.overlap_ratio_h - ov_h) < 1e-9
    # image offset step (reference): int((1-ov)*width/loop_step)//8
    assert g.offset_step_w == int((1 - ov_w) * 512 / 16) // 8
    assert g.offset_step_h == int((1 - ov_h) * 320 / 16) // 8
    # window origins at step 0: (0,0), then right window starts at
    # round(1 * win_w*(1-ov_w)) = total - win
    o = g.step_origins(0)
    assert o[0] == (0, 0)
    assert o[3] == (64 - 40, 128 - 64)
    # cyclic offsets shift every step, wrap at loop_step
    o1 = g.step_origins(1)
    assert o1[0] == (g.offset_step_h, g.offset_step_w)
    assert g.step_origins(16) == g.step_origins(0)


def test_planar_grid_rejects_uncoverable():
    with pytest.raises(AssertionError):
        PlanarGrid(total_h=64, total_w=128, win_h=40, win_w=64,
                   num_windows_h=2, num_windows_w=1, loop_step=16)


def test_integer_grid_ordering_and_dock():
    g = IntegerGrid(win_f=4, win_h=8, win_w=8, num_windows_f=1,
                    num_windows_h=2, num_windows_w=2, loop_step=4, dock_at_h=True)
    o0 = g.step_origins(0)
    # order: f, w, h (h innermost, matching reference loops)
    assert o0[:4] == [(0, 0, 0), (0, 8, 0), (0, 0, 8), (0, 8, 8)]
    # step 0 has zero offset -> no dock rows
    assert len(o0) == 4
    o1 = g.step_origins(1)
    # offset = (1%4)*(8//4) = 2 -> dock rows appended (top and bottom)
    assert len(o1) == 4 + 2 * 2
    assert (0, 0, 2) in o1[4:] and (0, 8, 2) in o1[4:]


def test_sphere_view_grid_counts():
    grid = {90: [0], -90: [0], 0: [0, 60, 120, 180, 240, 300],
            45: [0, 60, 120, 180, 240, 300], -45: [0, 60, 120, 180, 240, 300],
            75: [0, 60, 120, 180, 240, 300], -75: [0, 60, 120, 180, 240, 300],
            60: [0, 60, 120, 180, 240, 300], -60: [0, 60, 120, 180, 240, 300]}
    views = sphere_step_views(grid, 0, 10, 120)
    assert len(views) == 2 + 7 * 6  # 44 views (BASELINE.md)
    # theta offset cycles: step 3 -> offset (3%10)*(120//10) = 36
    v3 = sphere_step_views(grid, 3, 10, 120)
    assert v3[2][1] - views[2][1] == 36
    phases = sphere_phase_views(grid, 10, 120)
    assert len(phases) == 10
