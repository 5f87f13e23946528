"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this conftest imports first under
pytest, so tests exercise the multi-chip sharding code paths without TPU
hardware (the standard JAX substitute for a real slice).
"""

import os
import sys

# Force CPU even if the shell presets JAX_PLATFORMS (e.g. to a TPU plugin).
# NOTE: some PJRT plugins override the env var during discovery, so the
# authoritative switch is jax.config.update in pytest_configure below; the
# env vars are belt-and-braces for subprocesses.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # Authoritative platform/device-count selection (JAX >= 0.7): config
    # wins over env vars even when a TPU PJRT plugin hijacks JAX_PLATFORMS.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # backend already initialized — XLA_FLAGS fallback applies


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_model_and_vars():
    """A tiny canonical ContextUnet (n_feat=8, 16x16) with initialized variables."""
    import jax
    from camels_diffusion_model_tpu.models import ContextUnet

    model = ContextUnet(n_feat=8, n_cfeat=3, height=16, levels=2)
    x = np.zeros((2, 16, 16, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, np.array([0.5], np.float32))
    return model, variables
