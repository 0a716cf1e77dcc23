"""Process-level JAX platform selection for entry points.

`PIGO_TPU_PLATFORM` (e.g. "cpu", "tpu") pins the JAX backend for a whole
process — CLI, web server, benchmarks, test subprocesses. It must be
applied through `jax.config` rather than the `JAX_PLATFORMS` environment
variable: deployment shims (e.g. an accelerator plugin registered from
sitecustomize) may override the config at interpreter start, after which
the env var is ignored. A config update before the first backend use wins
either way — and keeps a CPU-pinned subprocess from blocking on an
unreachable accelerator tunnel.
"""

from __future__ import annotations

import os


def backend_platform(default: str = "cpu") -> str:
    """`jax.default_backend()` that never raises.

    Backend-plugin init failures (e.g. an accelerator tunnel answering
    UNAVAILABLE) map to `default`; callers treat non-TPU platforms as the
    CPU/interpret configuration, so a dead accelerator degrades instead of
    killing constructors (the BENCH_r03 failure mode: FaceCascade.__init__
    propagated the plugin's RuntimeError). Note this cannot defend against
    a backend probe that *hangs* — process-level entry points (bench.py)
    guard that case with a subprocess probe + timeout."""
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return default


def apply_platform_env() -> str | None:
    """Pin the JAX platform from `PIGO_TPU_PLATFORM`, if set.

    Call before the first jax.devices()/computation. Returns the applied
    platform name, or None when the env var is unset (JAX default rules
    apply). Safe to call multiple times with the same value."""
    platform = os.environ.get("PIGO_TPU_PLATFORM")
    if not platform:
        return None
    import jax

    jax.config.update("jax_platforms", platform)
    return platform
