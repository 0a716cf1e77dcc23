"""Tracing / profiling: first-class observability for the detection stack.

The reference has only ad-hoc wall-clock prints (cmd/pigo/main.go:132,232)
and a browser FPS meter (wasm/index.html:27-31). Here profiling is a module:

  * ``PipelineStats`` — per-stage wall-clock + windows/sec counters,
  * ``stage(...)`` — context-manager timer feeding the stats,
  * ``device_trace(...)`` — jax.profiler trace wrapper (XLA/TPU timeline,
    viewable in TensorBoard / Perfetto),
  * ``fps_meter(...)`` — rolling frames/sec for streaming loops (the
    stats.js equivalent).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from collections import deque


@dataclasses.dataclass
class StageStat:
    calls: int = 0
    seconds: float = 0.0
    items: int = 0

    @property
    def items_per_second(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


class PipelineStats:
    """Per-stage counters for a detection pipeline.

    >>> stats = PipelineStats()
    >>> with stats.stage("run_cascade", items=218449):
    ...     pass
    >>> stats.report()  # doctest: +SKIP
    """

    def __init__(self):
        self.stages: dict[str, StageStat] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        st = self.stages.setdefault(name, StageStat())
        t0 = time.perf_counter()
        try:
            yield st
        finally:
            st.seconds += time.perf_counter() - t0
            st.calls += 1
            st.items += items

    def add(self, name: str, seconds: float, items: int = 0):
        st = self.stages.setdefault(name, StageStat())
        st.seconds += seconds
        st.calls += 1
        st.items += items

    def as_dict(self) -> dict:
        total = time.perf_counter() - self._t0
        return {
            "total_seconds": total,
            "stages": {
                k: {
                    "calls": v.calls,
                    "seconds": round(v.seconds, 6),
                    "items": v.items,
                    "items_per_second": round(v.items_per_second, 1),
                }
                for k, v in self.stages.items()
            },
        }

    def report(self, file=None) -> str:
        text = json.dumps(self.as_dict(), indent=2)
        if file is not None:
            print(text, file=file)
        return text


@contextlib.contextmanager
def device_trace(log_dir: str, *, host_profile: bool = False):
    """Capture a jax.profiler device trace (TPU timeline) into log_dir.

    View with TensorBoard's profile plugin or Perfetto. No-op context if the
    profiler cannot start (e.g. another trace is active)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_trace=not host_profile)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class FpsMeter:
    """Rolling frames/sec over a sliding window (stats.js equivalent)."""

    def __init__(self, window: int = 30):
        self._times: deque[float] = deque(maxlen=window)

    def tick(self) -> float:
        self._times.append(time.perf_counter())
        return self.value

    @property
    def value(self) -> float:
        """Current rolling frames/sec (without registering a frame)."""
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0


def fps_meter(window: int = 30) -> FpsMeter:
    return FpsMeter(window)
