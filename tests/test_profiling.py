# -*- coding: utf-8 -*-
"""StepTimer: throughput reporting must exclude compiles and non-step gaps."""
from fddm_asr_tpu.profiling import StepTimer


def _feed(timer, intervals, t0=100.0):
    """Drive tick() with synthetic perf_counter values."""
    import fddm_asr_tpu.profiling as P

    now = [t0]
    real = P.time.perf_counter
    try:
        P.time.perf_counter = lambda: now[0]
        timer.tick()
        for dt in intervals:
            now[0] += dt
            timer.tick()
    finally:
        P.time.perf_counter = real


def test_skip_excludes_warmup():
    t = StepTimer(skip=2)
    _feed(t, [50.0, 40.0, 1.0, 1.0, 1.0])  # two compiles then steady steps
    assert abs(t.seconds_per_step - 1.0) < 1e-9


def test_mid_run_compile_rejected_as_outlier():
    """A deferred jit variant (e.g. the first apply_lfd step) lands a
    30-60 s interval mid-window; with >= 5 banked samples it must be
    dropped, not averaged into examples_per_s."""
    t = StepTimer(skip=0)
    _feed(t, [1.0] * 6 + [45.0] + [1.0] * 4)
    assert abs(t.seconds_per_step - 1.0) < 1e-9


def test_pause_forgets_epoch_boundary_gap():
    """pause() between epochs: the eval/checkpoint gap until the next
    tick is not a step."""
    t = StepTimer(skip=0)
    _feed(t, [1.0, 1.0])
    t.pause()
    _feed(t, [1.0], t0=500.0)  # 1 tick after a huge wall gap, then a step
    assert abs(t.seconds_per_step - 1.0) < 1e-9
    assert len(t._times) == 3
