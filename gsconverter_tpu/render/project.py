"""Splat projection: 3D covariance from quat/scale, EWA perspective splatting.

Standard 3DGS math (new capability — the reference has no renderer):
Sigma_3D = R S S^T R^T;  Sigma_2D = J W Sigma_3D W^T J^T + dilation*I with the
0.3-pixel low-pass dilation; conic = Sigma_2D^{-1}.
All functions are pure jnp, fused under jit with the rasterizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DILATION = 0.3


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[N,4] wxyz (need not be normalized) -> [N,3,3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=1,
    )


def covariance_3d(log_scale: jax.Array, quat: jax.Array) -> jax.Array:
    """Sigma = R S S R^T, S = diag(exp(log_scale)) [N,3,3]."""
    R = quat_to_rotmat(quat)
    S = jnp.exp(log_scale)  # [N,3]
    RS = R * S[:, None, :]
    return RS @ jnp.swapaxes(RS, 1, 2)


def project_gaussians(pos, log_scale, quat, cam):
    """Project to screen space.

    Returns dict with means2d [N,2], conic [N,3] (a,b,c of inverse cov),
    depth [N], radius [N], in_front [N] bool, and the camera-frame dirs [N,3]
    for SH evaluation.
    """
    R, t = cam.R, cam.t
    p_cam = pos @ R.T + t[None, :]
    z = p_cam[:, 2]
    in_front = z > 0.01
    zc = jnp.maximum(z, 0.01)

    mean_x = cam.fx * p_cam[:, 0] / zc + cam.cx
    mean_y = cam.fy * p_cam[:, 1] / zc + cam.cy
    means2d = jnp.stack([mean_x, mean_y], axis=1)

    # Jacobian of perspective projection (EWA), with 3DGS frustum clamping.
    lim_x = 1.3 * cam.cx / cam.fx
    lim_y = 1.3 * cam.cy / cam.fy
    tx = jnp.clip(p_cam[:, 0] / zc, -lim_x, lim_x) * zc
    ty = jnp.clip(p_cam[:, 1] / zc, -lim_y, lim_y) * zc
    J = jnp.zeros((pos.shape[0], 2, 3))
    J = J.at[:, 0, 0].set(cam.fx / zc)
    J = J.at[:, 0, 2].set(-cam.fx * tx / (zc * zc))
    J = J.at[:, 1, 1].set(cam.fy / zc)
    J = J.at[:, 1, 2].set(-cam.fy * ty / (zc * zc))

    W = R[None, :, :]  # world->cam rotation
    cov3d = covariance_3d(log_scale, quat)
    T = J @ (W @ cov3d @ jnp.swapaxes(W, 1, 2)) @ jnp.swapaxes(J, 1, 2)
    cov2d = T + DILATION * jnp.eye(2)[None, :, :]

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det = jnp.maximum(det, 1e-12)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], axis=1
    )

    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    view_dir = pos - cam.position[None, :]
    view_dir = view_dir / jnp.maximum(jnp.linalg.norm(view_dir, axis=1, keepdims=True), 1e-12)

    return dict(
        means2d=means2d, conic=conic, depth=z, radius=radius,
        in_front=in_front, view_dir=view_dir,
    )
