"""Test environment: force an 8-device virtual CPU mesh so sharding tests
stand in for a pod slice (SURVEY.md §4 'Implication').

The ambient environment may preload jax with a real-accelerator backend
(sitecustomize + JAX_PLATFORMS=axon), so plain env-var setdefault is not
enough: jax is already in sys.modules when conftest runs. Backend
*initialization* is still lazy, so flipping jax_platforms via
jax.config.update before the first device query reliably lands tests on
the 8-device virtual CPU platform. Bench/production runs use the real TPU;
tests must be hermetic + CPU-only.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

# Persistent on-disk compilation cache: with the aggressive clear_caches
# below (see fixture), re-JITs of shared stages become deserializations
# instead of full LLVM compiles. The cache directory is FINGERPRINTED by
# the host CPU: XLA:CPU AOT artifacts record the compile machine's
# feature set, and loading one on a host with different features
# SEGFAULTS inside the cache read (observed r5: a stale cache from a
# different container profile crashed test_ota_handover with the exact
# "machine features mismatch ... could lead to SIGILL" warning XLA
# prints). A per-host-profile directory makes a profile change a cache
# MISS instead of a crash.
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_profile = _f.read().split("flags", 1)[-1][:4000]
except OSError:
    _cpu_profile = platform.platform()
_host_fp = hashlib.md5(
    (platform.machine() + _cpu_profile).encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SRSUE_TEST_JAX_CACHE",
                   f"/tmp/srsue_test_jax_cache_{_host_fp}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# XLA:CPU's JIT accumulates loaded executables per process; past a few
# hundred compilations the backend segfaults INSIDE backend_compile (LLVM
# code-memory exhaustion — observed deterministically ~30 modules into the
# suite, crash site varying with test order). Dropping compiled programs
# between modules keeps the live-executable count bounded. Costs recompiles
# of cross-module shared stages but keeps one `pytest tests/` process green.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_xla_cpu_executable_memory():
    # function-scoped since r3: a single OTA module's compilations can
    # exceed the code-memory budget on small hosts (observed segfault in
    # backend_compile inside tests/test_harq_ota.py standalone); the
    # persistent cache configured above keeps the recompile cost low.
    yield
    jax.clear_caches()
