"""Utility-module tests: profiling counters, FPS meter, spinner."""

import io
import time

from pigo_tpu.utils.profiling import FpsMeter, PipelineStats
from pigo_tpu.utils.spinner import Spinner


def test_pipeline_stats_counts():
    stats = PipelineStats()
    with stats.stage("detect", items=100):
        pass
    with stats.stage("detect", items=50):
        pass
    d = stats.as_dict()
    st = d["stages"]["detect"]
    assert st["calls"] == 2
    assert st["items"] == 150
    assert st["items_per_second"] > 0
    assert "detect" in stats.report()


def test_fps_meter():
    m = FpsMeter(window=5)
    assert m.tick() == 0.0
    time.sleep(0.01)
    assert m.tick() > 0.0


def test_spinner_noop_without_tty():
    s = Spinner("working")
    with s:  # stderr is not a tty under pytest -> must no-op cleanly
        pass
    assert s._thread is None
