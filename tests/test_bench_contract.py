"""bench.py single-JSON-line contract under backend failure (invariant #3).

BENCH_r03 regression: a dead accelerator tunnel made `jax.default_backend()`
raise inside `FaceCascade.__init__` and bench.py exited 1 with a traceback on
stdout. The contract is: bench.py prints exactly ONE JSON line on stdout and
exits 0 — degrading to the native C++ host engine when the TPU probe fails,
and to a structured error line when the native engine is unavailable too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env: dict) -> tuple[int, list[str]]:
    env = dict(os.environ)
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, BENCH],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    return out.returncode, lines


def test_backend_failure_degrades_to_native_single_line():
    rc, lines = _run_bench({
        "PIGO_TPU_FORCE_BACKEND_ERROR": "1",
        "PIGO_TPU_BENCH_FRAMES": "4",
    })
    assert rc == 0
    assert len(lines) == 1, f"stdout must be one line, got: {lines}"
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "face_detection_frames_per_second"
    assert parsed["engine"] == "native-cpp"
    assert parsed["value"] > 0
    assert parsed["vs_baseline"] > 0
    assert "forced backend error" in parsed["tpu_fallback_reason"]


def test_backend_and_native_failure_emits_error_line():
    rc, lines = _run_bench({
        "PIGO_TPU_FORCE_BACKEND_ERROR": "1",
        "PIGO_TPU_NO_NATIVE": "1",
        "PIGO_TPU_BENCH_FRAMES": "4",
    })
    assert rc == 0
    assert len(lines) == 1, f"stdout must be one line, got: {lines}"
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "face_detection_frames_per_second"
    assert parsed["engine"] == "none"
    assert parsed["value"] == 0.0
    assert "native fallback failed" in parsed["error"]


def test_backend_platform_helper_never_raises(monkeypatch):
    import jax

    from pigo_tpu.utils.platform import backend_platform

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "default_backend", boom)
    assert backend_platform() == "cpu"
    assert backend_platform(default="tpu") == "tpu"
