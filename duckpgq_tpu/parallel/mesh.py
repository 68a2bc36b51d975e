"""Device mesh helpers for the distributed layer.

The reference is single-node shared-memory (SURVEY.md §2.7); this layer is
the net-new TPU-native distribution design: a 1-D mesh over chips (ICI) for
single-host slices, and a 2-D host x chip mesh for multi-host (BASELINE
configs 4-5): the ``chip`` axis rides ICI, the ``host`` axis DCN, and the
hierarchical frontier exchange gathers over ICI first so each DCN transfer
carries one combined block per host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_count: Optional[int] = None) -> None:
    """Multi-host entry point. On TPU pods call with no arguments (the
    runtime auto-detects coordinator/process topology). For multi-process
    validation on CPUs, pass coordinator_address ("host:port"),
    num_processes, process_id, and local_device_count to force that many
    virtual CPU devices per process (scripts/dryrun_multihost.py drives
    this with two local processes over a Gloo backend)."""
    import os
    import re
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       flags)
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def make_mesh_2d(n_hosts: Optional[int] = None,
                 chips_per_host: Optional[int] = None,
                 axes: Tuple[str, str] = ("host", "chip")) -> Mesh:
    """host x chip mesh. Devices are laid out so each mesh row holds one
    process's local devices: collectives over ``axes[1]`` stay intra-host
    (ICI), collectives over ``axes[0]`` cross hosts (DCN). Works equally
    on a single process (rows are then synthetic host groups — how the
    single-process tests model the hierarchy)."""
    devices = jax.devices()
    n_hosts = n_hosts or max(jax.process_count(), 1)
    chips_per_host = chips_per_host or len(devices) // n_hosts
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.array(devs[:n_hosts * chips_per_host], dtype=object).reshape(
        n_hosts, chips_per_host)
    return Mesh(grid, axes)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "x"):
    return NamedSharding(mesh, P(axis))
