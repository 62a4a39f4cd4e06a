"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
same pjit/shard_map code paths as a real pod slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import cpu_devices, make_cloud


def make_mesh(n=8):
    from gsconverter_tpu.parallel.mesh import make_mesh as mm

    return mm(devices=cpu_devices()[:n])


def test_mesh_and_sharding():
    from gsconverter_tpu.parallel.sharding import shard_cloud

    mesh = make_mesh()
    c = make_cloud(1000)  # pads to 1000 -> 1000 % 8 != 0 -> 1008
    sharded, valid_n = shard_cloud(c, mesh)
    assert valid_n == 1000
    assert sharded.n % 8 == 0
    assert len(sharded.pos.sharding.device_set) == 8


def test_sharded_kmeans_matches_quality():
    from gsconverter_tpu.parallel.distributed import sharded_kmeans

    r = np.random.default_rng(0)
    centers = np.array([[0, 0], [20, 0], [0, 20], [20, 20]], np.float32)
    x = np.concatenate(
        [r.normal(0, 0.3, (512, 2)).astype(np.float32) + t for t in centers]
    )
    mesh = make_mesh()
    c, labels = sharded_kmeans(jnp.asarray(x), 4, mesh, max_iter=10)
    c = np.asarray(c)
    for t in centers:
        assert np.min(np.linalg.norm(c - t, axis=1)) < 0.3
    assert labels.shape == (2048,)


def test_sharded_sor_matches_single_device():
    from gsconverter_tpu.parallel.distributed import sharded_sor_mask
    from gsconverter_tpu.ops.sor import sor_mask

    r = np.random.default_rng(1)
    dense = r.normal(0, 1.0, (4000, 3)).astype(np.float32)
    flyers = r.normal(0, 1.0, (24, 3)).astype(np.float32) + 100.0
    pos = jnp.asarray(np.concatenate([dense, flyers]))  # 4024 pts
    # pad to multiple of 8
    pos = jnp.concatenate([pos, pos[:8 - 4024 % 8]], axis=0)
    mesh = make_mesh()
    m_multi = np.asarray(sharded_sor_mask(pos, mesh, k=15, sigma=2.0, halo=256))
    m_single = np.asarray(sor_mask(pos, k=15, sigma=2.0))
    # flyers removed in both
    assert m_multi[4000:4024].mean() < 0.2
    assert m_single[4000:4024].mean() < 0.2
    # parity-by-construction: every pass shares the single-device path's
    # global Morton order and block partition, so per-point md matches and
    # only the mu/sigma reduction order can flip borderline decisions
    assert (m_multi == m_single).mean() >= 0.999


def test_sharded_render_matches_single():
    from gsconverter_tpu.parallel.distributed import sharded_render
    from gsconverter_tpu.parallel.sharding import pad_cloud
    from gsconverter_tpu.render import Camera, render, psnr

    c = make_cloud(256, sh_degree=1)
    c = c.replace(
        pos=c.pos * 0.5,
        log_scale=jnp.clip(c.log_scale, -5.0, -2.0),
        opacity=jnp.clip(c.opacity, -3.0, 3.0),
    )
    cam = Camera.look_at(eye=(0, 0, -6), target=(0, 0, 0), width=32, height=32)
    mesh = make_mesh()
    padded, _ = pad_cloud(c, 8)
    img_m = np.asarray(sharded_render(padded, cam, mesh, max_per_tile=256))
    img_s = np.asarray(render(c, cam, max_per_tile=256))
    assert float(psnr(jnp.asarray(img_m), jnp.asarray(img_s))) > 35.0


def test_sharded_ply_read(tmp_path):
    from gsconverter_tpu.formats import get_handler
    from gsconverter_tpu.parallel.io import read_ply_sharded, shard_bounds

    c = make_cloud(1000)
    path = str(tmp_path / "s.ply")
    get_handler("3dgs").write(c, path)

    parts = [read_ply_sharded(path, s, 4) for s in range(4)]
    assert sum(p.n for p in parts) == 1000
    # shards are contiguous slices in file order
    pos = np.concatenate([np.asarray(p.pos) for p in parts])
    np.testing.assert_allclose(pos, np.asarray(c.pos), atol=1e-6)
    # balanced split
    assert shard_bounds(10, 0, 4) == (0, 3) and shard_bounds(10, 3, 4) == (8, 10)


def test_strided_ply_write_matches_single_host(tmp_path):
    """Multi-host strided PLY write (VERDICT r4 item 6): H simulated hosts
    each seek-write ONLY their shard's record range into one file; the
    result is byte-identical to the single-host write.  No host ever holds
    more than its own shard."""
    from gsconverter_tpu.formats import get_handler
    from gsconverter_tpu.parallel.io import (read_ply_sharded, shard_bounds,
                                             write_ply_strided)

    n, hosts = 1003, 3
    c = make_cloud(n, sh_degree=3)
    single = str(tmp_path / "single.ply")
    get_handler("3dgs").write(c, single)

    strided = str(tmp_path / "strided.ply")
    # out-of-order host arrival: shard 2 writes before shard 0's header
    for shard in (2, 0, 1):
        lo, hi = shard_bounds(n, shard, hosts)
        local = c.select(np.arange(lo, hi))
        write_ply_strided(local, strided, shard, hosts, n)
    with open(single, "rb") as a, open(strided, "rb") as b:
        assert a.read() == b.read()

    # roundtrip through the sharded reader for good measure
    parts = [read_ply_sharded(strided, s, hosts) for s in range(hosts)]
    pos = np.concatenate([np.asarray(p.pos) for p in parts])
    np.testing.assert_allclose(pos, np.asarray(c.pos), atol=0)

    # mismatched shard row count is rejected, not silently misplaced
    import pytest
    with pytest.raises(ValueError):
        write_ply_strided(c.select(np.arange(5)), strided, 0, hosts, n)


def test_tile_sharded_render_matches_single():
    from gsconverter_tpu.parallel.distributed import sharded_render_tiles
    from gsconverter_tpu.parallel.sharding import pad_cloud
    from gsconverter_tpu.render import Camera, render, psnr

    c = make_cloud(256, sh_degree=1)
    c = c.replace(
        pos=c.pos * 0.5,
        log_scale=jnp.clip(c.log_scale, -5.0, -2.0),
        opacity=jnp.clip(c.opacity, -3.0, 3.0),
    )
    # 8 devices * 16-px tile rows -> height 128
    cam = Camera.look_at(eye=(0, 0, -6), target=(0, 0, 0), width=32, height=128)
    mesh = make_mesh()
    padded, _ = pad_cloud(c, 8)
    img_t = np.asarray(sharded_render_tiles(padded, cam, mesh, budget=512,
                                            max_per_tile=256))
    img_s = np.asarray(render(c, cam, max_per_tile=256))
    assert img_t.shape == img_s.shape
    assert float(psnr(jnp.asarray(img_t), jnp.asarray(img_s))) > 35.0


def test_tile_sharded_render_budget_pressure():
    """Budget accounting under REAL pressure: every splat covers every band
    (huge radii), so per-(src,dest) demand == the full shard size.

    - auto budget (None) must size itself to the demand: no truncation and
      the image matches the single-device render;
    - an explicit budget at 4x pressure (demand/4) must still land within
      a bounded PSNR of the oracle because truncation drops FARTHEST
      splats first (nearest-first selection).
    """
    from gsconverter_tpu.parallel.distributed import (band_occupancy,
                                                      sharded_render_tiles)
    from gsconverter_tpu.parallel.sharding import pad_cloud
    from gsconverter_tpu.render import Camera, render, psnr

    c = make_cloud(512, sh_degree=0)
    c = c.replace(
        pos=c.pos * 0.3,
        log_scale=jnp.full_like(c.log_scale, -0.5),  # big -> all bands
        opacity=jnp.clip(c.opacity, -3.0, 0.0),
    )
    cam = Camera.look_at(eye=(0, 0, -6), target=(0, 0, 0), width=32, height=128)
    mesh = make_mesh()
    padded, _ = pad_cloud(c, 8)

    occ = np.asarray(band_occupancy(padded, cam, mesh))
    assert occ.shape == (8, 8)
    demand = int(occ.max())
    assert demand >= 32, "scene must create real per-band demand"

    img_s = np.asarray(render(c, cam, max_per_tile=512))
    # auto budget: lossless redistribution
    img_auto = np.asarray(
        sharded_render_tiles(padded, cam, mesh, budget=None, max_per_tile=512)
    )
    assert float(psnr(jnp.asarray(img_auto), jnp.asarray(img_s))) > 35.0
    # 4x pressure: bounded degradation, farthest splats dropped first
    img_cap = np.asarray(
        sharded_render_tiles(padded, cam, mesh, budget=max(1, demand // 4),
                             max_per_tile=512)
    )
    assert float(psnr(jnp.asarray(img_cap), jnp.asarray(img_s))) > 15.0
