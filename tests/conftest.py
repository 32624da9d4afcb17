"""Test configuration.

Tests run on CPU with 8 virtual devices (SURVEY.md §4.3): parallelism logic
(TP/SP/ring attention) is validated on a fake 8-device mesh without TPU
hardware; Pallas kernels run in interpret mode. Real-TPU integration happens
in bench.py / scripts, not in the default pytest run (axon Pallas compiles
exceed 120 s — see SURVEY.md §7).

Env must be set before the first jax import, hence this conftest.
"""

import os

# NOTE: /root/.axon_site/sitecustomize.py imports jax at interpreter start
# (before conftest) with JAX_PLATFORMS=axon, so env vars alone are too late —
# jax.config.update after import is the effective override. XLA_FLAGS still
# works because the CPU backend initializes lazily (no devices created yet).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_xla_executables_between_modules():
    """XLA:CPU's LLVM JIT segfaults after enough compilations accumulate in
    one process (observed twice at ~140 suite items: SIGSEGV inside
    backend_compile_and_load on a module that passes standalone). Dropping
    the jit caches between modules releases unreferenced executables and
    keeps the per-process JIT population bounded. Costs some recompilation
    per module; correctness is unaffected.
    """
    yield
    jax.clear_caches()
    gc.collect()
