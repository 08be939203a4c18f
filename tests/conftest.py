"""Test configuration: CPU backend with an 8-device virtual mesh, f64 enabled.

Mirrors the strategy in SURVEY.md §4's "implication for the build": the dense jnp
oracle replaces gaussians.py's pure-torch twins as the correctness reference,
``jax.test_util.check_grads`` (f64) replaces ``torch.autograd.gradcheck``, and
multi-device sharding tests run on a virtual CPU mesh.
"""

import os

# Must be set before the first backend is initialized.  Force (not setdefault):
# the environment pins JAX_PLATFORMS=axon (the TPU tunnel) globally, and tests
# must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter start (before this
# file runs), so the env vars above may bind too late; the config route applies
# as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:
    pass  # older jax: the XLA_FLAGS path above covers it

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles dominate test wall-clock on small
# hosts; caching them across runs makes the suite fast after the first pass.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live executables between test modules.

    With ~150 accumulated compilations in one process, jaxlib 0.9.0's XLA:CPU
    executable (de)serialization for the persistent cache crashes
    (SIGSEGV/SIGABRT in ``executable.serialize()`` — reproduced only past
    ~100 prior tests; any subset passes).  Clearing jit caches per module
    keeps the live-executable count bounded and avoids the crash; the
    persistent on-disk cache makes the re-tracing cheap.
    """
    yield
    jax.clear_caches()
