"""Test config: route all tests to a virtual 8-device CPU mesh.

Note: in the axon environment, jax is pre-imported at interpreter startup
with the TPU platform and JAX_PLATFORMS cannot override it.  The CPU backend
is created lazily though, so setting XLA_FLAGS here (before first CPU use)
still yields 8 virtual CPU devices, and ``jax_default_device`` pins all test
computation to CPU.  Multi-chip sharding paths are validated on this mesh
(SURVEY.md §4); the real-TPU path is exercised by bench.py/__graft_entry__.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_cloud(n=1000, sh_degree=3, rgb=False, seed=0):
    """Synthetic but realistic SplatCloud."""
    import jax.numpy as jnp

    from gsconverter_tpu.cloud import DIM_FOR_DEGREE, SplatCloud

    r = np.random.default_rng(seed)
    pos = r.normal(0, 2.0, (n, 3)).astype(np.float32)
    sh_dc = r.normal(0, 0.5, (n, 3)).astype(np.float32)
    sh_rest = np.zeros((n, 3, 15), np.float32)
    dim = DIM_FOR_DEGREE[sh_degree]
    sh_rest[:, :, :dim] = r.normal(0, 0.1, (n, 3, dim)).astype(np.float32)
    opacity = r.normal(1.0, 2.0, (n,)).astype(np.float32)
    log_scale = r.normal(-4.0, 0.5, (n, 3)).astype(np.float32)
    quat = r.normal(0, 1.0, (n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    # canonicalize to positive-hemisphere w for round-trip comparisons
    quat *= np.sign(quat[:, :1] + 1e-12)
    cloud = SplatCloud(
        pos=jnp.asarray(pos),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
        opacity=jnp.asarray(opacity),
        log_scale=jnp.asarray(log_scale),
        quat=jnp.asarray(quat),
        normal=jnp.zeros((n, 3), jnp.float32),
        rgb=jnp.asarray(r.integers(0, 255, (n, 3)).astype(np.uint8)) if rgb else None,
        active_sh_degree=sh_degree,
    )
    return cloud


@pytest.fixture
def small_cloud():
    return make_cloud(512)
