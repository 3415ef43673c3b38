"""Test config: run on a virtual 8-device CPU mesh (standard JAX fake-backend
idiom) so sharding tests work without TPU hardware.

Note: this environment's axon TPU plugin ignores JAX_PLATFORMS=cpu, so we
must select the CPU backend explicitly (jax.devices('cpu') +
jax_default_device) rather than rely on the env var.
"""

import os

# Tests place computation on CPU while the axon TPU plugin remains the
# process-default backend: run Pallas kernels interpreted and keep the
# model-level default on the XLA attention path (kernel tests opt in).
os.environ.setdefault("DUOFORMER_PALLAS_INTERPRET", "1")
os.environ.setdefault("DUOFORMER_FUSED_ATTN", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:
    _cpus = jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return _cpus
