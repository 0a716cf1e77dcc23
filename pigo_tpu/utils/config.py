"""Runtime configuration: persistent XLA compilation cache.

The dense pyramid compiles one Mosaic kernel specialization per plane-shape
bucket (~10-20 for a typical config); the persistent cache amortizes that
across processes. Called once on first model construction.
"""

from __future__ import annotations

import os

_configured = False


def ensure_compilation_cache() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    cache_dir = os.environ.get(
        "PIGO_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pigo_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # PIGO_TPU_JAX_CACHE_WRITE=0: reads stay on, writes off. The test
        # suite sets this (tests/conftest.py): XLA:CPU's
        # LoadedExecutable.serialize() segfaults nondeterministically on
        # big pallas-interpret modules late in a many-compilation process,
        # and the min-compile-time check runs BEFORE serialization.
        if os.environ.get("PIGO_TPU_JAX_CACHE_WRITE", "1") == "0":
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1e9)
        else:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
