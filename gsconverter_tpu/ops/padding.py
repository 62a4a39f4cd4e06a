"""Shape bucketing: pad the splat axis to power-of-two sizes.

Every jit signature is compiled once per shape; filters change N at every
stage, which would force a fresh XLA compile per stage per scene.  Padding N
to the next power of two (with a dynamic ``n_valid`` scalar carried through
the computation) means each kernel compiles once per size bucket and is
reused for every scene and every filter stage — essential on TPU where
compiles are expensive and shapes must be static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_POS = 1e15  # far-away sentinel coordinate for padded points


def next_pow2(n: int, floor: int = 256) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def pad_rows(a: jax.Array, size: int, fill: float = 0.0) -> jax.Array:
    n = a.shape[0]
    if n == size:
        return a
    widths = [(0, size - n)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths, constant_values=fill)


def valid_mask(size: int, n_valid: jax.Array) -> jax.Array:
    return jnp.arange(size) < n_valid
