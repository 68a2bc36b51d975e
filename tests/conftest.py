"""Test configuration.

Runs JAX on a virtual 8-device CPU mesh so multi-chip sharding code is
exercised without TPU hardware (the driver separately dry-runs the multichip
path; see __graft_entry__.dryrun_multichip).
"""

import os

# force-override: the environment may pin JAX_PLATFORMS to the TPU plugin,
# and jax may already be imported via sitecustomize — use config.update
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "test", "sql"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference corpus not mounted at /root/reference")
