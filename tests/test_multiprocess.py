"""Real 2-process multi-host exercise (VERDICT r2 weak #6 / SURVEY 2.4 DCN).

Two OS processes join a jax.distributed cluster over localhost (2 virtual
CPU devices each -> a 4-device global mesh, gloo as the DCN transport) and
run the production window-sharded detection pass — Pallas kernels, on-device
hit compaction, all_gather + psum crossing the process boundary. Both ranks
must produce the frame's exact single-chip detections.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(port, env, root, worker):
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=root, text=True,
        )
        for rank in range(2)
    ]
    return [p.communicate(timeout=850) + (p.returncode,) for p in procs]


def test_two_process_window_sharded_parity():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mp_worker.py")
    # _free_port closes its probe socket before the workers re-bind the
    # port (unavoidable: jax.distributed needs a concrete address), so a
    # concurrent process can steal it — retry with a fresh port
    for attempt in range(3):
        port = _free_port()
        results = _run_workers(port, env, root, worker)
        if all(rc == 0 for _, _, rc in results):
            break
        bind_race = any("bind" in err.lower() or "address" in err.lower()
                        for _, err, rc in results if rc != 0)
        if not bind_race or attempt == 2:
            out, err, rc = next(r for r in results if r[2] != 0)
            raise AssertionError(f"worker failed:\n{out}\n{err[-3000:]}")
    outs = []
    for out, err, rc in results:
        lines = [l for l in out.splitlines() if l.startswith("DETS ")]
        assert len(lines) == 1, out
        outs.append(np.asarray(json.loads(lines[0][5:])))

    # both ranks agree bit-for-bit
    assert np.array_equal(outs[0], outs[1])

    # and match the single-process fast path on the same frame
    from pigo_tpu.ops import face_pallas
    from pigo_tpu.models.face import FaceCascade
    from tests._mp_worker import make_frame

    prev = face_pallas.TAIL_MIN_WINDOWS
    face_pallas.TAIL_MIN_WINDOWS = 512
    try:
        frame = make_frame()
        want = FaceCascade().sparse_hits(
            frame, frame.shape[0], frame.shape[1], min_size=20, max_size=100,
            shift_factor=0.1, scale_factor=1.3,
        )
    finally:
        face_pallas.TAIL_MIN_WINDOWS = prev
    assert want.shape[0] >= 2
    assert np.array_equal(outs[0], want)
