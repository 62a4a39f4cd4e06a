"""Numeric sanity guards (SURVEY.md §5 "add jax.debug/checkify NaN guards").

JAX's functional model removes the data races the reference guarded with
``ti.atomic_add``; what remains worth guarding is numeric health.  Under
``--debug`` the converter validates the canonical cloud between stages.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..cloud import SplatCloud
from .log import status_print


def validate_cloud(cloud: SplatCloud, where: str = "") -> list[str]:
    """Returns a list of problems found (empty = healthy)."""
    problems: list[str] = []
    checks = dict(
        pos=cloud.pos, sh_dc=cloud.sh_dc, sh_rest=cloud.sh_rest,
        opacity=cloud.opacity, log_scale=cloud.log_scale, quat=cloud.quat,
    )
    for name, a in checks.items():
        bad = int(jnp.sum(~jnp.isfinite(a)))
        if bad:
            problems.append(f"{name}: {bad} non-finite values")
    if cloud.n:
        qn = jnp.linalg.norm(cloud.quat, axis=-1)
        off = int(jnp.sum(jnp.abs(qn - 1.0) > 0.01))
        if off:
            problems.append(f"quat: {off} not unit-norm (|q| off by >1%)")
        ls = float(jnp.max(jnp.abs(cloud.log_scale)))
        if ls > 30:
            problems.append(f"log_scale: extreme magnitude {ls:.1f}")
    for p in problems:
        status_print(f"[validate{':' + where if where else ''}] {p}")
    return problems
