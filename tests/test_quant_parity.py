"""Residency parity: every quantization core must produce IDENTICAL bits
whether it runs in numpy (host-resident pipeline) or jnp (device/jit).

This is the contract behind the transfer policy (utils/transfer.py): codec
math has ONE implementation dispatched by input residency, so the host
fast path can never drift from the jit path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsconverter_tpu.ops import quant


@pytest.fixture(scope="module")
def quats():
    r = np.random.default_rng(0)
    q = r.normal(size=(2000, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # include axis-aligned edge cases
    q[:8] = np.eye(4, 4)[[0, 1, 2, 3, 0, 1, 2, 3]]
    q[4:8] *= -1
    return q


def _both(fn, *arrays):
    host = fn(*arrays)
    dev = fn(*(jnp.asarray(a) for a in arrays))
    return host, dev


def _assert_same(host, dev):
    if isinstance(host, tuple):
        for h, d in zip(host, dev):
            _assert_same(h, d)
        return
    assert isinstance(host, np.ndarray), type(host)
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_rot_packers_parity(quats):
    for fn in (quant.pack_rot_spz, quant.pack_rot_cply):
        host, dev = _both(fn, quats)
        assert host.dtype == np.uint32
        _assert_same(host, dev)
    _assert_same(*_both(quant.pack_rot_sog, quats))


def test_rot_unpack_roundtrip_host(quats):
    rq = quant.unpack_rot_spz(quant.pack_rot_spz(quats))
    assert isinstance(rq, np.ndarray)
    dot = np.abs(np.sum(rq * quats, axis=1))
    assert np.abs(dot - 1).max() < 1e-2
    rq = quant.unpack_rot_cply(quant.pack_rot_cply(quats))
    dot = np.abs(np.sum(rq * quats, axis=1))
    assert np.abs(dot - 1).max() < 5e-3


def test_fixed24_parity_and_roundtrip():
    r = np.random.default_rng(1)
    pos = (r.normal(size=(1000, 3)) * 5).astype(np.float32)
    host, dev = _both(quant.pos_to_fixed24, pos, 12)
    _assert_same(host, dev)
    back = quant.fixed24_to_pos(host, 12)
    assert isinstance(back, np.ndarray)
    assert np.abs(back - pos).max() < 2 / 4096


def test_packed_u32_parity():
    r = np.random.default_rng(2)
    pos = (r.normal(size=(1000, 3)) * 5).astype(np.float32)
    mins, maxs = pos.min(0), pos.max(0)
    host, dev = _both(quant.pack_11_10_11, pos, mins, maxs)
    assert host.dtype == np.uint32
    _assert_same(host, dev)
    up = quant.unpack_11_10_11(host, mins, maxs)
    assert isinstance(up, np.ndarray)
    assert np.abs(up - pos).max() < 0.02

    rgb = np.clip(r.normal(0.5, 0.3, (1000, 3)), 0, 1).astype(np.float32)
    alpha = r.random(1000).astype(np.float32)
    z3, o3 = np.zeros(3, np.float32), np.ones(3, np.float32)
    host, dev = _both(quant.pack_8888, rgb, alpha, z3, o3)
    assert host.dtype == np.uint32
    _assert_same(host, dev)


def test_scalar_maps_parity():
    r = np.random.default_rng(3)
    logits = (r.normal(size=1000) * 4).astype(np.float32)
    _assert_same(*_both(quant.logit_to_u8, logits))
    u8 = r.integers(0, 256, 1000).astype(np.uint8)
    # log/exp maps: numpy libm vs XLA approximations differ by ~1 ulp —
    # allclose, not bit-equal (quantized outputs above ARE bit-equal)
    for fn in (quant.u8_to_logit, quant.u8_to_logit_splat):
        host, dev = _both(fn, u8)
        assert isinstance(host, np.ndarray)
        np.testing.assert_allclose(host, np.asarray(dev), rtol=1e-5, atol=1e-6)
    sh = (r.normal(size=(1000, 9)) * 0.3).astype(np.float32)
    for bits in (4, 5):
        _assert_same(*_both(quant.quant_sh_spz, sh, bits))


def test_morton_and_codebook_parity():
    r = np.random.default_rng(4)
    ix = r.integers(0, 1024, 1000).astype(np.uint32)
    iy = r.integers(0, 1024, 1000).astype(np.uint32)
    iz = r.integers(0, 1024, 1000).astype(np.uint32)
    host, dev = _both(quant.morton3_u32, ix, iy, iz)
    assert host.dtype == np.uint32
    _assert_same(host, dev)

    cb = np.sort(r.normal(size=256).astype(np.float32))
    vals = r.normal(size=1000).astype(np.float32)
    _assert_same(*_both(quant.nearest_codebook_index, vals, cb))


def test_readers_return_host_clouds(tmp_path):
    """Every codec reader yields numpy leaves (the pipeline residency)."""
    from tests.conftest import make_cloud
    from gsconverter_tpu.formats import get_handler

    c = make_cloud(500, sh_degree=2).to_numpy()
    for fmt in ("3dgs", "splat", "spz", "ksplat", "compressed_ply", "parquet"):
        h = get_handler(fmt)
        path = str(tmp_path / f"x_{fmt}{h.extension}")
        h.write(c, path)
        back = get_handler(fmt).read(path)
        assert back.is_host, fmt
        assert isinstance(back.pos, np.ndarray), fmt


def test_to_host_chunked_roundtrip():
    """transfer.to_host must return identical bytes through the chunked
    concurrent path (arrays above the chunk threshold) and the direct path."""
    import jax.numpy as jnp

    from gsconverter_tpu.utils import transfer

    r = np.random.default_rng(0)
    big = r.normal(size=(3_000_000, 3)).astype(np.float32)  # 36MB > chunk
    small = r.normal(size=(100, 3)).astype(np.float32)
    for arr in (big, small):
        out = transfer.to_host(jnp.asarray(arr))
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, arr)
    # numpy passthrough
    assert transfer.to_host(big) is not None
    assert transfer.is_host(big) and not transfer.is_host(jnp.asarray(small))
