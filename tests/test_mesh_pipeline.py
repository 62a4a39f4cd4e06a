"""Mesh-integrated pipeline tests (VERDICT r1 item 2): the Converter and the
ops dispatch automatically to the multi-chip paths when a mesh is active,
and the results match the single-device pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import cpu_devices, make_cloud


@pytest.fixture
def mesh8():
    from gsconverter_tpu.parallel.mesh import (
        clear_active_mesh, make_mesh, set_active_mesh,
    )

    mesh = make_mesh(devices=cpu_devices()[:8])
    set_active_mesh(mesh)
    yield mesh
    clear_active_mesh()


def _flyer_cloud(n=20000, n_fly=200, seed=3, scatter=False):
    """Dense blob + flyers: a far blob (density-filter bait) or isolated
    scattered points (unambiguous SOR outliers)."""
    c = make_cloud(n, sh_degree=1, seed=seed)
    r = np.random.default_rng(seed)
    pos = np.array(c.pos)
    if scatter:
        pos[-n_fly:] = r.uniform(40.0, 200.0, (n_fly, 3)).astype(np.float32) \
            * r.choice([-1.0, 1.0], (n_fly, 3)).astype(np.float32)
    else:
        pos[-n_fly:] = r.normal(0, 1.0, (n_fly, 3)).astype(np.float32) + 60.0
    return c.replace(pos=jnp.asarray(pos))


def test_sharded_kmeans_chunked_matches_single():
    from gsconverter_tpu.ops.kmeans import kmeans_chunked
    from gsconverter_tpu.parallel.mesh import (
        clear_active_mesh, make_mesh, set_active_mesh,
    )

    r = np.random.default_rng(0)
    x = r.normal(0, 1, (16384, 8)).astype(np.float32)
    c1, l1 = kmeans_chunked(x, 8, 32, max_iter=5, impl="xla")
    set_active_mesh(make_mesh(devices=cpu_devices()[:8]))
    try:
        c2, l2 = kmeans_chunked(x, 8, 32, max_iter=5)  # auto -> sharded
    finally:
        clear_active_mesh()
    # per-chunk math is keyed by the GLOBAL chunk index, so sharding over
    # the chunk axis reproduces the single-device result
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    assert (np.asarray(l1) == np.asarray(l2)).mean() > 0.999


def test_remove_flyers_mesh_dispatch_matches(mesh8):
    from gsconverter_tpu.ops import filters
    from gsconverter_tpu.parallel.mesh import clear_active_mesh

    c = _flyer_cloud(4096 + 24 + 3, n_fly=24, scatter=True)  # odd N: padding path
    out_m = filters.remove_flyers(c, intensity=5)
    clear_active_mesh()
    out_s = filters.remove_flyers(c, intensity=5)
    # flyers removed in both (sigma 12.4 is loose — borderline ones survive
    # either way); keep-sets agree
    assert out_m.n < c.n
    assert out_s.n < c.n
    assert abs(out_m.n - out_s.n) <= int(0.01 * c.n)


def test_converter_mesh_e2e_ply_to_sog(mesh8, tmp_path):
    """Full ply -> sog with SOR + density on the 8-device mesh, compared to
    the single-device pipeline (VERDICT r1 'done' criterion)."""
    from gsconverter_tpu.converter import convert
    from gsconverter_tpu.formats import get_handler
    from gsconverter_tpu.parallel.mesh import clear_active_mesh

    c = _flyer_cloud(20000, n_fly=200)
    src = str(tmp_path / "scene.ply")
    get_handler("3dgs").write(c, src)

    out_m = str(tmp_path / "mesh.sog")
    convert(src, out_m, "sog", sor_intensity=5, density_sensitivity=0.5,
            compression_level=9)
    dec_m = get_handler("sog").read(out_m)

    clear_active_mesh()
    out_s = str(tmp_path / "single.sog")
    convert(src, out_s, "sog", sor_intensity=5, density_sensitivity=0.5,
            compression_level=9)
    dec_s = get_handler("sog").read(out_s)

    # flyers gone, same keep-set size
    assert dec_m.n < 20000
    assert abs(dec_m.n - dec_s.n) <= int(0.01 * 20000)
    assert float(jnp.max(dec_m.pos[:, 0])) < 30.0
    if dec_m.n == dec_s.n:
        # identical keep-set -> positions quantize identically
        np.testing.assert_allclose(
            np.asarray(dec_m.pos), np.asarray(dec_s.pos), atol=1e-2
        )
        # codebook-quantized attrs differ only by init randomness
        assert float(jnp.mean(jnp.abs(dec_m.log_scale - dec_s.log_scale))) < 0.1
        assert float(jnp.mean(jnp.abs(dec_m.sh_dc - dec_s.sh_dc))) < 0.1
