"""Test configuration.

Tests run on CPU with 8 virtual devices (SURVEY.md §4.3): parallelism logic
(TP/SP/ring attention) is validated on a fake 8-device mesh without TPU
hardware; Pallas kernels run in interpret mode. Real-TPU integration happens
in bench.py / scripts, not in the default pytest run (axon Pallas compiles
exceed 120 s — see SURVEY.md §7).

Env must be set before the first jax import, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_debug_nans", False)  # enabled per-test where useful
