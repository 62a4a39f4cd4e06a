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


# --------------------------------------------------------- active mesh context
#
# The pipeline dispatches to the multi-chip code paths automatically whenever
# more than one device is visible — the TPU-native analogue of the
# reference's automatic GPU/CPU backend dispatch
# (/root/reference/gsconverter/processing/gpu_ops.py:33-46).  ``set_active_mesh``
# overrides (a specific mesh, or None to force single-device ops).

_ACTIVE_MESH: Mesh | None = None
_MESH_OVERRIDDEN = False


def set_active_mesh(mesh: Mesh | None) -> None:
    """Pin the pipeline to a specific mesh (or force single-device with None)."""
    global _ACTIVE_MESH, _MESH_OVERRIDDEN
    _ACTIVE_MESH = mesh
    _MESH_OVERRIDDEN = True


def clear_active_mesh() -> None:
    """Restore automatic mesh resolution."""
    global _ACTIVE_MESH, _MESH_OVERRIDDEN
    _ACTIVE_MESH = None
    _MESH_OVERRIDDEN = False


def active_mesh() -> Mesh | None:
    """The mesh the pipeline should run on: the pinned one, else an
    auto-created 1-D mesh over all devices when more than one exists."""
    global _ACTIVE_MESH
    if _MESH_OVERRIDDEN:
        return _ACTIVE_MESH
    if _ACTIVE_MESH is None and len(jax.devices()) > 1:
        _ACTIVE_MESH = make_mesh()
    return _ACTIVE_MESH


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard the leading (splat) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator: str | None = None) -> None:
    """Multi-host process-group init (no-op on single host)."""
    if jax.process_count() > 1 or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)
