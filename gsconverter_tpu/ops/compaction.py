"""Device-side compaction of masked splats.

SURVEY.md §2.4: "compaction via sharded prefix-sum".  A stable argsort on
the inverted keep-mask moves survivors to the front in-order (XLA lowers
this to a distributed sort on sharded inputs); only the survivor COUNT
crosses to the host, where the final static-shape slice happens.  This keeps
the heavy data movement on device instead of round-tripping full leaves
through numpy boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import SplatCloud


@jax.jit
def _front_pack_order(mask: jax.Array):
    """Stable order placing kept rows first; plus survivor count."""
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    return order, jnp.sum(mask)


def compact(cloud: SplatCloud, mask: jax.Array) -> SplatCloud:
    """Return a new cloud with only mask=True splats (device gather).

    The gather/sort run on device (sharded inputs use XLA's distributed
    sort); only the scalar count syncs to host for the final slice.
    """
    order, count = _front_pack_order(mask)
    packed = cloud.select(order)
    n_keep = int(count)

    def slice_leaf(a):
        return None if a is None else a[:n_keep]

    return packed.replace(
        pos=slice_leaf(packed.pos),
        sh_dc=slice_leaf(packed.sh_dc),
        sh_rest=slice_leaf(packed.sh_rest),
        opacity=slice_leaf(packed.opacity),
        log_scale=slice_leaf(packed.log_scale),
        quat=slice_leaf(packed.quat),
        normal=slice_leaf(packed.normal),
        rgb=slice_leaf(packed.rgb),
        extras={k: slice_leaf(v) for k, v in packed.extras.items()},
    )
