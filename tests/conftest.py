"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's device-agnostic CPU test strategy (its tests pick
"cuda:0 if available else cpu", tests/core/test_models.py:20); we additionally force 8
virtual host devices so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4.8).

Env vars must be set BEFORE jax initializes a backend; the `jax.config.update` call
overrides any platform plugin registered by site customizations.
"""
import os

os.environ.setdefault("MUJOCO_GL", "egl")  # headless mujoco rendering
os.environ["JAX_PLATFORMS"] = "cpu"  # tests must be fast + hermetic (no TPU tunnel)
_prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _prev:
    os.environ["XLA_FLAGS"] = (_prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
