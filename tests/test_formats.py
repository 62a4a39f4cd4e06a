"""Format-matrix round-trip tests: encode -> decode -> allclose within each
format's quantization tolerance (SURVEY.md §4 strategy (a))."""

import numpy as np
import pytest

from gsconverter_tpu.formats import get_handler
from tests.conftest import make_cloud


def match_rows(a_pos, b_pos):
    """Pair rows of b to rows of a by nearest position (codecs that reorder)."""
    from scipy.spatial import cKDTree

    idx = cKDTree(np.asarray(b_pos)).query(np.asarray(a_pos), k=1)[1]
    return idx


def roundtrip(fmt, tmp_path, cloud, **kw):
    h = get_handler(fmt)
    path = str(tmp_path / f"t{h.extension}")
    h.write(cloud, path, **kw)
    return get_handler(fmt).read(path)


# ------------------------------------------------------------------ lossless


@pytest.mark.parametrize("fmt", ["3dgs", "cc", "parquet"])
def test_lossless_roundtrip(fmt, tmp_path):
    c = make_cloud(257, sh_degree=3, rgb=(fmt == "cc"))
    d = roundtrip(fmt, tmp_path, c)
    np.testing.assert_allclose(d.pos, c.pos, atol=1e-6)
    np.testing.assert_allclose(d.sh_dc, c.sh_dc, atol=1e-6)
    np.testing.assert_allclose(d.sh_rest, c.sh_rest, atol=1e-6)
    np.testing.assert_allclose(d.opacity, c.opacity, atol=1e-6)
    np.testing.assert_allclose(d.log_scale, c.log_scale, atol=1e-6)
    np.testing.assert_allclose(d.quat, c.quat, atol=1e-6)
    assert d.active_sh_degree == 3


def test_ply_prefix_normalization(tmp_path):
    """CC write adds scalar_ prefixes; read normalizes them away."""
    c = make_cloud(64, rgb=True)
    path = str(tmp_path / "cc.ply")
    get_handler("cc").write(c, path)
    from gsconverter_tpu.utils import ply

    names = ply.read(path)["vertex"].data.dtype.names
    assert "scalar_f_dc_0" in names and "x" in names and "red" in names
    d = get_handler("cc").read(path)
    np.testing.assert_allclose(d.sh_dc, c.sh_dc, atol=1e-6)


def test_ply_extras_passthrough(tmp_path):
    import jax.numpy as jnp

    c = make_cloud(64)
    c = c.replace(extras={"my_label": jnp.arange(64, dtype=jnp.float32)})
    d = roundtrip("3dgs", tmp_path, c)
    assert "my_label" in d.extras
    np.testing.assert_allclose(d.extras["my_label"], np.arange(64), atol=0)


def test_ply_crop_sh(tmp_path):
    c = make_cloud(64, sh_degree=1)
    h = get_handler("3dgs")
    path = str(tmp_path / "c.ply")
    h.write(c, path, crop_sh=True)
    from gsconverter_tpu.utils import ply

    names = ply.read(path)["vertex"].data.dtype.names
    rest = [n for n in names if n.startswith("f_rest_")]
    # degree-1 channel-major: last nonzero flat index is 32 (b channel coeff 2)
    assert len(rest) == 33


# -------------------------------------------------------------------- lossy


def test_splat_roundtrip(tmp_path):
    c = make_cloud(200, sh_degree=0)
    d = roundtrip("splat", tmp_path, c)
    assert d.n == 200
    # writer sorts by volume*alpha; compare as sets via sorted positions
    a = np.sort(np.asarray(c.pos), axis=0)
    b = np.sort(np.asarray(d.pos), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)
    # per-splat fields after matching order
    order_c = np.argsort(np.asarray(c.pos)[:, 0])
    order_d = np.argsort(np.asarray(d.pos)[:, 0])
    np.testing.assert_allclose(
        np.asarray(c.log_scale)[order_c], np.asarray(d.log_scale)[order_d], atol=1e-5
    )
    qc = np.asarray(c.quat)[order_c]
    qd = np.asarray(d.quat)[order_d]
    dot = np.abs(np.sum(qc * qd, axis=1))
    assert np.all(dot > 0.999)  # u8 quantization tolerance


def test_spz_roundtrip(tmp_path):
    c = make_cloud(300, sh_degree=2)
    d = roundtrip("spz", tmp_path, c)
    assert d.n == 300 and d.active_sh_degree == 2
    np.testing.assert_allclose(d.pos, c.pos, atol=2.0 / (1 << 12))
    np.testing.assert_allclose(d.log_scale, c.log_scale, atol=1.0 / 16.0)
    np.testing.assert_allclose(d.sh_dc, c.sh_dc, atol=(1.0 / 255.0) / 0.15 + 1e-3)
    dot = np.abs(np.sum(np.asarray(c.quat) * np.asarray(d.quat), axis=1))
    assert np.all(dot > 0.9999)
    # SH: 5-bit snapping on first block => step 8/128
    np.testing.assert_allclose(
        np.asarray(d.sh_rest)[:, :, :3], np.asarray(c.sh_rest)[:, :, :3], atol=8.5 / 128
    )
    np.testing.assert_allclose(
        np.asarray(d.sh_rest)[:, :, 3:8], np.asarray(c.sh_rest)[:, :, 3:8], atol=16.5 / 128
    )


def test_compressed_ply_roundtrip(tmp_path):
    c = make_cloud(600, sh_degree=2)
    d = roundtrip("compressed_ply", tmp_path, c)
    assert d.n == 600
    # morton reorder: pair rows by nearest position
    idx = match_rows(c.pos, d.pos)
    np.testing.assert_allclose(np.asarray(d.pos)[idx], np.asarray(c.pos), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(d.log_scale)[idx], np.clip(np.asarray(c.log_scale), -20, 20), atol=3e-2
    )
    # opacity is 8-bit in SIGMOID space; tails of the logit are saturated
    sig = lambda x: 1 / (1 + np.exp(-np.asarray(x)))
    np.testing.assert_allclose(
        sig(d.opacity)[idx], sig(c.opacity), atol=1.5 / 255
    )
    qd = np.asarray(d.quat)[idx]
    qc = np.asarray(c.quat)
    assert np.all(np.abs(np.sum(qc * qd, axis=1)) > 0.999)
    # SH u8 uses truncating quantization (reference compressed_ply.py:246):
    # error bound is a full 8/256 step
    np.testing.assert_allclose(
        np.asarray(d.sh_rest)[idx][:, :, :8],
        np.asarray(c.sh_rest)[:, :, :8],
        atol=8.0 / 256 + 1e-3,
    )


@pytest.mark.parametrize("level", [0, 1, 2])
def test_ksplat_roundtrip(level, tmp_path):
    c = make_cloud(300, sh_degree=2)
    d = roundtrip("ksplat", tmp_path, c, compression_level=level)
    assert d.n == 300
    # levels >= 1 morton-reorder for tight buckets: pair rows by position
    idx = match_rows(c.pos, d.pos) if level >= 1 else np.arange(300)
    tol_pos = 1e-6 if level == 0 else 5.0 / 2.0 / 32767 + 1e-3
    np.testing.assert_allclose(np.asarray(d.pos)[idx], c.pos, atol=tol_pos)
    tol_scale = 1e-3 if level == 0 else 2e-2
    np.testing.assert_allclose(np.asarray(d.log_scale)[idx], c.log_scale, atol=tol_scale)
    dot = np.abs(np.sum(np.asarray(c.quat) * np.asarray(d.quat)[idx], axis=1))
    assert np.all(dot > 0.999)
    tol_sh = {0: 1e-6, 1: 2e-3, 2: 4.0 / 255 + 1e-3}[level]
    np.testing.assert_allclose(
        np.asarray(d.sh_rest)[idx][:, :, :8], np.asarray(c.sh_rest)[:, :, :8], atol=tol_sh
    )
    # degree capped at 2: coeffs 8..14 zeroed
    assert np.all(np.asarray(d.sh_rest)[:, :, 8:] == 0)


def test_sog_roundtrip(tmp_path):
    c = make_cloud(2000, sh_degree=1)
    d = roundtrip("sog", tmp_path, c)
    assert d.n == 2000
    idx = match_rows(c.pos, d.pos)
    np.testing.assert_allclose(np.asarray(d.pos)[idx], np.asarray(c.pos), atol=2e-3)
    # codebook-compressed channels: loose statistical tolerance
    assert abs(np.mean(np.asarray(d.log_scale)) - np.mean(np.asarray(c.log_scale))) < 0.1
    assert abs(np.mean(np.asarray(d.sh_dc)) - np.mean(np.asarray(c.sh_dc))) < 0.1
    assert d.active_sh_degree == 1


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_sog_low_degree_sh_roundtrip(tmp_path, deg):
    """Per-channel SH integrity through the palette at every degree.

    Regression: the writer built the palette input as ``flat[:, :coeffs]``
    of the [N,45] canonical layout, which for degrees < 3 packs
    [R0..R14, G0..Gk] instead of the degree-packed [R0.., G0.., B0..] the
    container (and the reference) uses — scrambling G/B on read.  Mean-
    based checks can't see a channel permutation; per-channel correlation
    can."""
    c = make_cloud(3000, sh_degree=deg, seed=11)
    d = roundtrip("sog", tmp_path, c)
    idx = match_rows(c.pos, d.pos)
    dim = {1: 3, 2: 8, 3: 15}[deg]
    a = np.asarray(c.sh_rest)[:, :, :dim]
    b = np.asarray(d.sh_rest)[idx][:, :, :dim]
    for ch in range(3):
        r = np.corrcoef(a[:, ch, :].ravel(), b[:, ch, :].ravel())[0, 1]
        assert r > 0.8, (deg, ch, r)
    assert d.active_sh_degree == deg
