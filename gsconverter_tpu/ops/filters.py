"""Filter engine — pure functions SplatCloud -> (SplatCloud, report).

TPU-first replacement for the reference's mutating ``DataProcessor``
(processing/data_processor.py): every filter computes a keep-mask in one
fused jit pass over the sharded SoA cloud; compaction happens at stage
boundaries.  Exact parameter semantics preserved (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import SplatCloud
from ..utils.log import debug_print, status_print
from . import density as density_ops
from . import sor as sor_ops


def _apply_mask(cloud: SplatCloud, mask, name: str) -> SplatCloud:
    n0 = cloud.n
    if cloud.is_host:
        # host-resident pipeline: mask (possibly on device) is read back
        # (N bools) and compaction is a numpy gather — the heavy leaves
        # never cross the slow device->host direction (utils/transfer.py)
        out = cloud.compact(np.asarray(mask))
    else:
        from .compaction import compact

        out = compact(cloud, jnp.asarray(mask))
    status_print(f"After {name}, retained {out.n} out of {n0} vertices.")
    return out


@jax.jit
def _bbox_mask(pos, lo, hi):
    return jnp.all((pos >= lo[None, :]) & (pos <= hi[None, :]), axis=1)


def crop_by_bbox(cloud: SplatCloud, bbox) -> SplatCloud:
    """Keep splats inside [min,max] box (reference data_processor.py:215-231)."""
    if cloud.is_host:
        lo = np.asarray(bbox[:3], np.float32)
        hi = np.asarray(bbox[3:], np.float32)
        mask = np.all((cloud.pos >= lo) & (cloud.pos <= hi), axis=1)
    else:
        lo = jnp.asarray(bbox[:3], jnp.float32)
        hi = jnp.asarray(bbox[3:], jnp.float32)
        mask = _bbox_mask(cloud.pos, lo, hi)
    return _apply_mask(cloud, mask, "cropping")


def alpha_filter(cloud: SplatCloud, min_opacity_u8: int) -> SplatCloud:
    """Threshold in logit space (reference data_processor.py:184-213)."""
    limit = int(min_opacity_u8)
    if limit <= 0:
        return cloud
    if limit >= 255:
        status_print("Alpha Filter: min 255 removes all splats.")
        return cloud.compact(np.zeros(cloud.n, bool))
    t = np.clip(limit / 255.0, 1e-6, 1.0 - 1e-6)
    logit_thresh = float(np.log(t / (1.0 - t)))
    # dispatches by residency: numpy compare on host leaves, jnp on device
    mask = cloud.opacity >= logit_thresh
    return _apply_mask(cloud, mask, f"alpha filter (min {limit})")


def density_filter(
    cloud: SplatCloud,
    voxel_size: float = 1.0,
    threshold_percentage: float = 0.32,
    sensitivity: float | None = None,
    keep_multicluster: bool = False,
) -> SplatCloud:
    """Voxel density + largest-cluster filter (reference data_processor.py:11-117)."""
    if sensitivity is not None:
        voxel_size, threshold_percentage = density_ops.sensitivity_to_params(sensitivity)
    debug_print(
        f"Density Filter Params: Voxel={voxel_size:.4f}, "
        f"Thresh={threshold_percentage:.4f}%, MultiCluster={keep_multicluster}"
    )
    if cloud.n == 0:
        return cloud
    mask = density_ops.density_mask(
        cloud.pos, voxel_size, threshold_percentage, keep_multicluster=keep_multicluster
    )
    return _apply_mask(cloud, mask, "density filter")


def remove_flyers(
    cloud: SplatCloud,
    k: int = 25,
    threshold_factor: float = 10.5,
    intensity: float | None = None,
) -> SplatCloud:
    """SOR filter (reference data_processor.py:119-182; intended-mask semantics)."""
    if intensity is not None:
        k, threshold_factor = sor_ops.intensity_to_params(intensity)
    debug_print(f"SOR Filter (Remove Flyers) Params: K={k}, Sigma={threshold_factor:.2f}")
    if cloud.n == 0:
        return cloud
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is not None and mesh.devices.size > 1 and cloud.n > mesh.devices.size:
        # automatic multi-chip dispatch (analogue of the reference's GPU/CPU
        # ladder, gpu_ops.py:33-46): halo-exchange SOR over the mesh
        from ..parallel.distributed import sharded_sor_mask

        debug_print(f"SOR: dispatching to {mesh.devices.size}-device mesh")
        mask = sharded_sor_mask(cloud.pos, mesh, k=int(k),
                                sigma=float(threshold_factor))
    else:
        mask = sor_ops.sor_mask(cloud.pos, int(k), float(threshold_factor))
    return _apply_mask(cloud, mask, "removing flyers")


def auto_bbox(cloud: SplatCloud) -> SplatCloud:
    """Report-only tight bbox (reference data_processor.py:335-354)."""
    if cloud.n == 0:
        status_print("Auto-BBox: No points remaining. Bounding box is undefined.")
        return cloud
    mins = np.asarray(jnp.min(cloud.pos, axis=0))
    maxs = np.asarray(jnp.max(cloud.pos, axis=0))
    status_print(
        f"Auto-BBox Applied: [{mins[0]:.4f}, {mins[1]:.4f}, {mins[2]:.4f}] "
        f"to [{maxs[0]:.4f}, {maxs[1]:.4f}, {maxs[2]:.4f}]"
    )
    return cloud
