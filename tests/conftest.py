"""Test configuration.

Runs JAX on a virtual 8-device CPU mesh so multi-chip sharding code is
exercised without TPU hardware (the driver separately dry-runs the multichip
path; see __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "test", "sql"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference corpus not mounted at /root/reference")
