"""Pinhole camera model for the differentiable rasterizer.

New capability vs the reference (which has no renderer, SURVEY.md intro);
conventions follow standard 3DGS: world-to-camera extrinsics, +z forward,
pixel coords with origin at the top-left.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    world_to_cam: jax.Array  # [4,4] f32
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = dataclasses.field(default=256, metadata=dict(static=True))
    height: int = dataclasses.field(default=256, metadata=dict(static=True))

    @classmethod
    def look_at(
        cls,
        eye,
        target,
        up=(0.0, 1.0, 0.0),
        fov_deg: float = 60.0,
        width: int = 256,
        height: int = 256,
    ) -> "Camera":
        eye = np.asarray(eye, np.float32)
        target = np.asarray(target, np.float32)
        up = np.asarray(up, np.float32)
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)  # world->cam rows
        t = -R @ eye
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
        return cls(
            world_to_cam=jnp.asarray(w2c),
            fx=jnp.float32(f),
            fy=jnp.float32(f),
            cx=jnp.float32(width / 2),
            cy=jnp.float32(height / 2),
            width=width,
            height=height,
        )

    @property
    def R(self) -> jax.Array:
        return self.world_to_cam[:3, :3]

    @property
    def t(self) -> jax.Array:
        return self.world_to_cam[:3, 3]

    @property
    def position(self) -> jax.Array:
        return -self.R.T @ self.t
