"""Device mesh helpers for the distributed layer.

The reference is single-node shared-memory (SURVEY.md §2.7); this layer is
the net-new TPU-native distribution design: a 1-D mesh over chips (ICI), with
vertex-partitioned graph state and XLA collectives for frontier exchange.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "x"):
    return NamedSharding(mesh, P(axis))
