"""Splat optimization: fit a SplatCloud to target images.

The training-step counterpart of the differentiable rasterizer (the
reference converts only; this is the new capability that makes every
conversion verifiable by pixel gradients and enables refinement workflows).

``make_train_step`` builds a jitted step over an optional device mesh:
splat params sharded on the ``data`` axis, target image on ``tile`` rows;
XLA inserts the gradient all-reduces (SURVEY.md §2.4 "grads all-reduced").
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..cloud import SplatCloud
from .camera import Camera
from .rasterizer import render

TRAINABLE = ("pos", "sh_dc", "sh_rest", "opacity", "log_scale", "quat")


def params_of(cloud: SplatCloud) -> dict[str, jax.Array]:
    return {k: getattr(cloud, k) for k in TRAINABLE}


def cloud_with(cloud: SplatCloud, params: dict[str, jax.Array]) -> SplatCloud:
    return cloud.replace(**params)


def make_train_step(cloud: SplatCloud, cam: Camera, tx, **render_kw):
    """Returns jitted ``step(params, opt_state, target) -> (params, opt_state, loss)``."""

    def loss_fn(p, target):
        img = render(cloud_with(cloud, p), cam, **render_kw)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(p, opt_state, target):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(p, target)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        # keep quaternions normalized after the update
        q = p["quat"]
        p = dict(p, quat=q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8))
        return p, opt_state, loss

    return step


def fit(
    cloud: SplatCloud,
    cam: Camera,
    target: jax.Array,
    steps: int = 100,
    lr: float = 1e-2,
    **render_kw: Any,
) -> tuple[SplatCloud, list[float]]:
    """Optimize all splat parameters against one target image."""
    import optax

    tx = optax.adam(lr)
    params = params_of(cloud)
    opt_state = tx.init(params)
    step = make_train_step(cloud, cam, tx, **render_kw)
    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, target)
        losses.append(float(loss))
    return cloud_with(cloud, params), losses
