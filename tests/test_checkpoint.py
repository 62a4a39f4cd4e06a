"""Checkpoint / resume tests (SURVEY.md §5 obligation)."""

import numpy as np

from gsconverter_tpu.utils import checkpoint
from tests.conftest import make_cloud


def test_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    c = make_cloud(128, sh_degree=2, rgb=True)
    c = c.replace(extras={"lbl": jnp.arange(128, dtype=jnp.float32)})
    checkpoint.save(c, str(tmp_path), "after_density")
    d = checkpoint.load(str(tmp_path), "after_density")
    np.testing.assert_allclose(d.pos, c.pos)
    np.testing.assert_allclose(d.sh_rest, c.sh_rest)
    np.testing.assert_array_equal(d.rgb, c.rgb)
    np.testing.assert_allclose(d.extras["lbl"], c.extras["lbl"])
    assert d.active_sh_degree == 2


def test_latest_stage(tmp_path):
    stages = ["read", "density", "sor", "write"]
    c = make_cloud(16)
    assert checkpoint.latest_stage(str(tmp_path), stages) is None
    checkpoint.save(c, str(tmp_path), "read")
    checkpoint.save(c, str(tmp_path), "density")
    assert checkpoint.latest_stage(str(tmp_path), stages) == "density"
