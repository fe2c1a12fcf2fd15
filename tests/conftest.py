"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (SURVEY.md §4: the TPU framework must add
host-count-agnostic sharding tests; the single-process reference has none).
float64 is enabled so solver convergence checks match the reference's
double-precision numerics; the TPU fast path uses float32/bfloat16.

NOTE: under the axon TPU plugin the ``JAX_PLATFORMS`` env var is ignored —
``jax.config.update("jax_platforms", "cpu")`` after import is what actually
keeps tests off the (single, shared, slow-to-compile-for-f64) TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_addoption(parser):
    parser.addoption(
        "--update-goldens", action="store_true", default=False,
        help="regenerate checked-in golden convergence curves",
    )
