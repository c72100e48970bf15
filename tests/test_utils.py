"""Utility subsystem tests: tracing scopes and stage timers."""

import time

from videoprocessingframework_tpu.utils.tracing import StageTimer, trace_range


def test_trace_range_noop_and_nesting():
    with trace_range("DemuxFrame"):
        with trace_range("DecodeFrame"):
            pass


def test_trace_range_exception_propagates():
    try:
        with trace_range("X"):
            raise ValueError("boom")
    except ValueError as e:
        assert str(e) == "boom"


def test_stage_timer_summary():
    t = StageTimer()
    with t.measure("a"):
        time.sleep(0.01)
    with t.measure("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.01
