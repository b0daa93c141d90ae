"""Test configuration: force an 8-device host-CPU platform so all mesh /
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication),
and put the src/ tree on sys.path without requiring an install.

Note: this image's sitecustomize imports jax at interpreter startup (to
register the TPU tunnel platform), so plain env vars are read too early —
we must go through jax.config before any backend is initialized."""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("ALVQ_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax falls back to XLA_FLAGS
    pass

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))
