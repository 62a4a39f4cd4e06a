"""Spherical-harmonics utilities: degree detection, capping, RGB synthesis.

Behavior contracts from the reference:
  - active-degree detection scans content backwards for the last non-zero
    AC coefficient (converter.py:119-146),
  - SH capping zeroes coefficients above the target degree and never
    upscales (data_processor.py:273-298, converter.py:165-188),
  - RGB synthesis: RGB = clip(0.5 + C0*dc, 0, 1)^(1/2.2) * 255 — note the
    deliberate sRGB gamma (data_processor.py:300-333).

All compute here is jit-able jnp over the SoA cloud.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import DIM_FOR_DEGREE, SH_C0, SplatCloud

# Degree-aware real SH basis constants (standard 3DGS evaluation set).
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


@jax.jit
def _active_coeffs_device(rest: jax.Array) -> jax.Array:
    """[15] per-coeff any-nonzero flags, reduced ON DEVICE."""
    return jnp.any(rest != 0, axis=(0, 1))


def detect_active_degree(cloud: SplatCloud, max_degree: int | None = None) -> int:
    """Active SH degree from content (last non-zero AC coeff).

    Host-returning (concrete int) — used at pipeline staging time, mirroring
    reference converter.py:129-146.  Residency-aware: host clouds reduce in
    numpy; device clouds reduce on device and read back 15 bools — never the
    full [N,3,15] tensor (the round-2 e2e bottleneck: a 180 MB device->host
    pull per conversion at 1M splats).

    ``max_degree``: structural upper bound from the source codec (its
    column count) — bands above it are zero BY CONSTRUCTION of the
    canonical [N,3,15] layout, so the scan skips them (at 10M splats the
    band-3 scan alone is an 840 MB pass, ~0.5 s).  Only pass this for a
    cloud fresh from a reader; after processing, content is what counts.
    """
    rest = cloud.sh_rest
    top = 3 if max_degree is None else max(0, min(3, int(max_degree)))
    if isinstance(rest, np.ndarray):
        # Only the HIGHEST active band matters, so scan band 3 (coeffs
        # 8..14), then band 2 (3..7), then band 1 (0..2) — in row chunks
        # with an early exit on the first nonzero.  A degree-3 source
        # answers after one ~64k-row chunk (~5 ms at any N) instead of a
        # full 180 MB pass (~150-200 ms at 1M, ~20% of the e2e pipeline).
        # The worst case (all-zero sh_rest -> degree 0) still reads every
        # band once, same as the old single np.any.
        n = rest.shape[0]
        chunk = 65536
        for degree, lo, hi in ((3, 8, 15), (2, 3, 8), (1, 0, 3)):
            if degree > top:
                continue
            for i0 in range(0, n, chunk):
                if rest[i0:i0 + chunk, :, lo:hi].any():
                    return degree
        return 0
    nonzero = np.asarray(_active_coeffs_device(rest))
    # Per-channel coeff j active for any channel -> degree from j.
    active = np.nonzero(nonzero[:DIM_FOR_DEGREE[top]])[0]
    if active.size == 0:
        return 0
    last = int(active[-1])
    if last >= 8:
        return 3
    if last >= 3:
        return 2
    return 1


def effective_sh_degree(cloud: SplatCloud, kwargs: dict, cap: int) -> int:
    """Content SH degree for a codec write, capped at ``cap``.

    The converter pipeline already ran the full content scan and synced
    ``active_sh_degree``; it passes that as ``sh_content_degree`` in the
    write kwargs so codecs skip a second full pass over sh_rest (~0.5 s
    at 3M splats).  Direct handler users without the hint get the scan."""
    hint = kwargs.get("sh_content_degree")
    d = int(hint) if hint is not None else detect_active_degree(cloud)
    return min(d, cap)


def cap_degree(cloud: SplatCloud, degree: int | None) -> SplatCloud:
    """Zero AC coefficients above ``degree`` (jit-able).

    Reference data_processor.py:273-298 (indexes translated from flat
    f_rest_{i>=start} to per-channel coeff columns).
    """
    if degree is None or degree >= 3:
        return cloud
    dim = DIM_FOR_DEGREE[degree]
    if isinstance(cloud.sh_rest, np.ndarray):
        if dim == 0:
            # all-zero result: a 0-stride broadcast view costs nothing
            # (180 MB allocate+copy at 1M splats otherwise); downstream
            # consumers only read it, and select/compact rematerializes
            rest = np.broadcast_to(
                np.zeros((), np.float32), cloud.sh_rest.shape
            )
        else:
            # zero-fill + copy only the surviving columns (reads dim/15
            # of the source instead of all of it)
            rest = np.zeros_like(cloud.sh_rest)
            rest[:, :, :dim] = cloud.sh_rest[:, :, :dim]
    else:
        mask = (jnp.arange(cloud.sh_rest.shape[-1]) < dim).astype(cloud.sh_rest.dtype)
        rest = cloud.sh_rest * mask[None, None, :]
    return cloud.replace(
        sh_rest=rest,
        active_sh_degree=min(cloud.active_sh_degree, degree),
    )


def _xp(a):
    """numpy for host inputs, jnp for device arrays / tracers
    (residency-generic helpers, see ops/quant.py)."""
    return np if isinstance(a, (np.ndarray, np.generic)) else jnp


def rgb_linear_from_dc(sh_dc) -> jax.Array:
    """[N,3] linear RGB in [0,1] from SH DC."""
    return _xp(sh_dc).clip(0.5 + SH_C0 * sh_dc, 0.0, 1.0)


def rgb_u8_srgb_from_dc(sh_dc) -> jax.Array:
    """Display RGB with sRGB gamma (reference data_processor.py:321-333)."""
    xp = _xp(sh_dc)
    lin = rgb_linear_from_dc(sh_dc)
    return (xp.power(lin, 1.0 / 2.2) * 255.0).astype(jnp.uint8)


def rgb_u8_linear_from_dc(sh_dc) -> jax.Array:
    """Linear-space u8 RGB used inside binary codecs (reference splat.py:135)."""
    xp = _xp(sh_dc)
    return xp.clip((0.5 + SH_C0 * sh_dc) * 255.0, 0.0, 255.0).astype(jnp.uint8)


def dc_from_rgb_u8(rgb) -> jax.Array:
    """Inverse of the linear u8 mapping (reference splat.py:75-77)."""
    return (rgb.astype(jnp.float32) / 255.0 - 0.5) / SH_C0


def add_rgb(cloud: SplatCloud) -> SplatCloud:
    """Attach display RGB synthesized from DC if missing
    (reference data_processor.py:233-271).  Residency-preserving."""
    if cloud.rgb is not None:
        return cloud
    if isinstance(cloud.sh_dc, np.ndarray):
        lin = np.clip(0.5 + SH_C0 * cloud.sh_dc, 0.0, 1.0)
        rgb = (np.power(lin, 1.0 / 2.2) * 255.0).astype(np.uint8)
        return cloud.replace(rgb=rgb)
    return cloud.replace(rgb=rgb_u8_srgb_from_dc(cloud.sh_dc))


def eval_sh(cloud: SplatCloud, dirs: jax.Array, degree: int | None = None) -> jax.Array:
    """Evaluate view-dependent color for unit view dirs [N,3] -> linear RGB [N,3].

    Used by the differentiable rasterizer; degree defaults to the cloud's
    active degree. Standard real-SH basis (same convention as Inria 3DGS).
    """
    deg = cloud.active_sh_degree if degree is None else degree
    c = 0.5 + SH_C0 * cloud.sh_dc  # [N,3]
    if deg == 0:
        return c
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    rest = cloud.sh_rest  # [N,3,15] channel-major
    # Basis values [N, dim]
    b1 = jnp.concatenate([-y, z, -x], axis=1) * SH_C1  # coeffs 0..2
    c = c + jnp.einsum("ncj,nj->nc", rest[:, :, 0:3], b1)
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        b2 = jnp.concatenate(
            [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * xz,
                SH_C2[4] * (xx - yy),
            ],
            axis=1,
        )
        c = c + jnp.einsum("ncj,nj->nc", rest[:, :, 3:8], b2)
    if deg >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        b3 = jnp.concatenate(
            [
                SH_C3[0] * y * (3.0 * xx - yy),
                SH_C3[1] * xy * z,
                SH_C3[2] * y * (4.0 * zz - xx - yy),
                SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                SH_C3[4] * x * (4.0 * zz - xx - yy),
                SH_C3[5] * z * (xx - yy),
                SH_C3[6] * x * (xx - 3.0 * yy),
            ],
            axis=1,
        )
        c = c + jnp.einsum("ncj,nj->nc", rest[:, :, 8:15], b3)
    return c
