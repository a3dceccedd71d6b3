"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware
(mirrors the multi-host test strategy of SURVEY.md §4)."""

import os

# Force CPU: the machine env pins JAX_PLATFORMS=axon (real TPU tunnel) AND
# /root/.axon_site/sitecustomize.py imports jax at interpreter startup, so
# jax's config has already snapshotted the env — override the live config
# too, not just the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_CLOUDS = "/root/reference/examples/test_clouds"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles many hundreds of XLA CPU programs; keeping them
    all alive in the jit caches has crashed the CPU backend twice near the
    END of full runs (an abort in backend_compile at test 210+, then a
    segfault at test 230+ — both compiles that pass in isolation). The
    persistent disk cache (enabled above) makes re-warming cheap, so the
    accumulated in-process state is the only thing this discards."""
    yield
    jax.clear_caches()


@pytest.fixture()
def rng():
    # Function-scoped: every test draws the same deterministic stream, so
    # outcomes cannot depend on test execution order.
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def frame_pair():
    """The bundled 120k-point RGBD fixture clouds, if present."""
    import os.path

    from cilantro_tpu.utils import read_point_cloud

    f1 = os.path.join(REFERENCE_CLOUDS, "frame_1.ply")
    f2 = os.path.join(REFERENCE_CLOUDS, "frame_2.ply")
    if not (os.path.exists(f1) and os.path.exists(f2)):
        pytest.skip("reference test clouds unavailable")
    return read_point_cloud(f1), read_point_cloud(f2)
