"""SplatCloud sharding: pad + place the SoA pytree over a mesh.

All filters are element-wise masks over the N axis, so data parallelism is a
NamedSharding over N (SURVEY.md §2.4 row 1); cross-shard compute (SOR halos,
K-Means reductions, distributed rendering) lives in parallel/distributed.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cloud import SplatCloud


def pad_cloud(cloud: SplatCloud, multiple: int) -> tuple[SplatCloud, int]:
    """Pad N to a multiple with far-away zero-opacity splats; returns (cloud, valid_n).

    Padding splats are placed beyond any real data so spatial filters ignore
    them, with opacity logit -30 (alpha ~ 0) so rendering ignores them too.
    """
    n = cloud.n
    pad = (-n) % multiple
    if pad == 0:
        return cloud, n
    far = float(np.asarray(jnp.max(jnp.abs(cloud.pos))) * 2 + 1e6)

    def pad_leaf(a, fill=0.0):
        if a is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    return (
        cloud.replace(
            pos=pad_leaf(cloud.pos, far),
            sh_dc=pad_leaf(cloud.sh_dc),
            sh_rest=pad_leaf(cloud.sh_rest),
            opacity=pad_leaf(cloud.opacity, -30.0),
            log_scale=pad_leaf(cloud.log_scale),
            quat=jnp.concatenate(
                [cloud.quat, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (pad, 1))], axis=0
            ),
            normal=pad_leaf(cloud.normal),
            rgb=pad_leaf(cloud.rgb) if cloud.rgb is not None else None,
            extras={k: pad_leaf(v) for k, v in cloud.extras.items()},
        ),
        n,
    )


def place_cloud(cloud: SplatCloud, mesh: Mesh, axis: str = "data") -> SplatCloud:
    """Place every leaf sharded over N WITHOUT padding (uneven last shard is
    fine for GSPMD element-wise stages; ops needing even shards — SOR halos,
    chunked K-Means — pad internally)."""

    def place(a):
        if a is None:
            return None
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return cloud.replace(
        pos=place(cloud.pos),
        sh_dc=place(cloud.sh_dc),
        sh_rest=place(cloud.sh_rest),
        opacity=place(cloud.opacity),
        log_scale=place(cloud.log_scale),
        quat=place(cloud.quat),
        normal=place(cloud.normal),
        rgb=place(cloud.rgb),
        extras={k: place(v) for k, v in cloud.extras.items()},
    )


def shard_cloud(cloud: SplatCloud, mesh: Mesh, axis: str = "data") -> tuple[SplatCloud, int]:
    """Pad to the mesh size and place every leaf sharded over N."""
    n_dev = mesh.devices.size
    padded, valid_n = pad_cloud(cloud, n_dev)

    def place(a):
        if a is None:
            return None
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return (
        padded.replace(
            pos=place(padded.pos),
            sh_dc=place(padded.sh_dc),
            sh_rest=place(padded.sh_rest),
            opacity=place(padded.opacity),
            log_scale=place(padded.log_scale),
            quat=place(padded.quat),
            normal=place(padded.normal),
            rgb=place(padded.rgb),
            extras={k: place(v) for k, v in padded.extras.items()},
        ),
        valid_n,
    )
