"""Test configuration: force a CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (no TPU pod is
available in CI); the Pallas kernels run in interpret mode on CPU. Set
PIGO_TPU_TEST_PLATFORM=tpu to run the suite against real hardware.
"""

import os

platform = os.environ.get("PIGO_TPU_TEST_PLATFORM", "cpu")
if platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The TPU plugin environment may have imported jax already (via
    # sitecustomize), so env JAX_PLATFORMS is too late — use config.update
    # before the first backend use.
    # Persistent-cache READS stay on, WRITES off: XLA:CPU's
    # LoadedExecutable.serialize() segfaults nondeterministically on the
    # suite's big pallas-interpret modules after many compilations in one
    # process (observed 3x, different tests, all inside
    # compilation_cache.put_executable_and_time). Honored by
    # pigo_tpu.utils.config.ensure_compilation_cache, which otherwise
    # re-enables writes on first model construction.
    os.environ.setdefault("PIGO_TPU_JAX_CACHE_WRITE", "0")

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sample_image():
    from pigo_tpu.io.image import get_image

    return get_image("assets/testdata/sample.jpg")


@pytest.fixture(scope="session")
def sample_gray(sample_image):
    from pigo_tpu.io.image import rgb_to_grayscale

    return rgb_to_grayscale(sample_image).reshape(
        sample_image.shape[0], sample_image.shape[1]
    )


@pytest.fixture(scope="session")
def face_forest():
    from pigo_tpu.cascade.assets import load_facefinder

    return load_facefinder()


@pytest.fixture(scope="session")
def pupil_forest():
    from pigo_tpu.cascade.assets import load_puploc

    return load_puploc()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
