"""Resumable pipeline tests: preempted run continues from last snapshot."""

import os

import numpy as np

from gsconverter_tpu.converter import convert
from gsconverter_tpu.formats import get_handler
from tests.conftest import make_cloud


def test_pipeline_checkpoints_and_resumes(tmp_path):
    c = make_cloud(600)
    src = str(tmp_path / "s.ply")
    get_handler("3dgs").write(c, src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "o.splat")

    cloud1 = convert(src, out, "splat", min_opacity=30, sor_intensity=4.0,
                     checkpoint_dir=ckpt)
    # snapshots exist for the active stages
    assert os.path.exists(os.path.join(ckpt, "alpha", "manifest.json"))
    assert os.path.exists(os.path.join(ckpt, "sor", "manifest.json"))

    # a resumed run must produce the identical result without rerunning filters
    out2 = str(tmp_path / "o2.splat")
    cloud2 = convert(src, out2, "splat", min_opacity=30, sor_intensity=4.0,
                     checkpoint_dir=ckpt)
    assert cloud2.n == cloud1.n
    np.testing.assert_allclose(np.asarray(cloud2.pos), np.asarray(cloud1.pos))
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_deferred_compaction_matches_per_stage(tmp_path):
    """The deferred-compaction fast path (host pipeline, no checkpointing)
    must produce byte-identical output to the per-stage compaction path
    (which checkpoint_dir forces)."""
    c = make_cloud(800, seed=5)
    src = str(tmp_path / "s.ply")
    get_handler("3dgs").write(c, src)
    kw = dict(min_opacity=25, sor_intensity=4.0, density_sensitivity=0.3,
              bbox=(-3, -3, -3, 3, 3, 3))

    out_fast = str(tmp_path / "fast.splat")
    convert(src, out_fast, "splat", **kw)  # deferred compaction

    out_slow = str(tmp_path / "slow.splat")
    convert(src, out_slow, "splat", checkpoint_dir=str(tmp_path / "ck"), **kw)

    assert open(out_fast, "rb").read() == open(out_slow, "rb").read()
