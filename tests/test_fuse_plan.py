"""Per-shape fusion dispatch plan (ops/fused_temporal.plan_allows): the
measured-table routing added in round 4 (VERDICT r3 #2). Covers the parse /
override surface and that the mega/block legality gates consult the plan at
the real UNet transformer shapes."""

import pytest

from dynamicscaler_tpu.ops import fused_block, fused_mega, fused_temporal


@pytest.fixture(autouse=True)
def _restore():
    yield
    fused_temporal.set_plan("auto")
    fused_temporal.set_mode("auto")
    fused_temporal._DISABLED = frozenset()


def test_default_table_levels():
    # measured winners (dev/bench_block.py xfmr, TPU v5e, BENCH_NOTES r4)
    assert not fused_temporal.plan_allows("mega", "t", 320)  # wrap+blk
    assert fused_temporal.plan_allows("block", "t", 320)
    assert fused_temporal.plan_allows("wrap", "t", 320)
    assert not fused_temporal.plan_allows("block", "t", 640)  # wrap+sub
    assert fused_temporal.plan_allows("wrap", "t", 640)
    assert fused_temporal.plan_allows("mega", "s", 320)
    assert not fused_temporal.plan_allows("mega", "s", 640)  # subs
    assert not fused_temporal.plan_allows("wrap", "s", 640)


def test_unknown_shape_allows_everything():
    for kind in ("mega", "block", "wrap"):
        assert fused_temporal.plan_allows(kind, "t", 64)
        assert fused_temporal.plan_allows(kind, "s", 96)


def test_plan_off_allows_everything():
    fused_temporal.set_plan("off")
    assert fused_temporal.plan_allows("mega", "t", 320)
    assert fused_temporal.plan_allows("block", "t", 640)


def test_plan_override_spec():
    fused_temporal.set_plan("t320=mega,s640=subs")
    assert fused_temporal.plan_allows("mega", "t", 320)
    assert not fused_temporal.plan_allows("wrap", "s", 640)
    # untouched entries keep their defaults
    assert not fused_temporal.plan_allows("block", "t", 640)


def test_bad_plan_spec_rejected():
    with pytest.raises(AssertionError):
        fused_temporal.set_plan("t320=warp")
    with pytest.raises(AssertionError):
        fused_temporal.set_plan("x320=mega")


def test_gates_consult_plan_at_real_shapes():
    # interpret mode makes the availability check pass on CPU; the gates
    # are pure predicates (no kernel runs here)
    fused_temporal.set_mode("interpret")
    # t320 plan=wrap+blk: mega gate vetoed, block gate open
    assert not fused_mega.temporal_ok(16, 320, 320, 5, 40, 64)
    assert fused_block.temporal_block_fusable(16, 320, 320, 5)
    # t640 plan=wrap+sub: both mega and block vetoed
    assert not fused_mega.temporal_ok(16, 640, 640, 10, 20, 32)
    assert not fused_block.temporal_block_fusable(16, 640, 640, 10)
    # s320 plan=mega: mega gate open; s640 plan=subs: vetoed
    assert fused_mega.spatial_ok(2560, 320, 320, 5, 1024)
    assert not fused_mega.spatial_ok(640, 640, 640, 10, 1024)
    # plan off -> t320 mega legal again
    fused_temporal.set_plan("off")
    assert fused_mega.temporal_ok(16, 320, 320, 5, 40, 64)
    # kill switches still veto on top of the plan
    fused_temporal._DISABLED = frozenset(["mega_t"])
    assert not fused_mega.temporal_ok(16, 320, 320, 5, 40, 64)
