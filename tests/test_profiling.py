"""StepTimer percentile summary (utils/profiling.py)."""

import time

from spine_vision_tpu.utils.profiling import StepTimer


def test_step_timer_summary_skips_warmup():
    t = StepTimer()
    for i in range(4):
        with t.measure():
            time.sleep(0.01 if i else 0.05)  # first "step" is compile-like
    assert len(t) == 4
    s = t.summary(skip_first=1)
    assert s["steps"] == 3
    assert s["p50_s"] < 0.04  # warmup excluded
    assert s["p95_s"] >= s["p50_s"] >= 0.0


def test_step_timer_empty_and_reset():
    t = StepTimer()
    assert t.summary() == {}
    with t.measure():
        pass
    assert len(t) == 1
    t.reset()
    assert t.summary() == {}
