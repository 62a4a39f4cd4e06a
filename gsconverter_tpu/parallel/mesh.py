"""Device-mesh helpers.

The reference has no distributed code (SURVEY.md §2.4) — this layer is the
new first-class capability: one ``Mesh(('data',))`` (or ``('data','tile')``)
over all chips; splats sharded on ``data``, screen tiles on ``tile``.
Collectives ride ICI via XLA (psum / all_gather / ppermute); multi-host
process groups come from ``jax.distributed.initialize``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",)) -> Mesh:
    """1-D (or reshaped n-D) mesh over the given / all devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if len(axis_names) == 1:
        return Mesh(devices, axis_names)
    # split leading axis: data-major layout
    n = devices.size
    per = [1] * len(axis_names)
    per[0] = n
    return Mesh(devices.reshape(per), axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard the leading (splat) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator: str | None = None) -> None:
    """Multi-host process-group init (no-op on single host)."""
    if jax.process_count() > 1 or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)
