"""Differentiable rasterizer tests: tiled vs naive-reference forward allclose
+ pixel-gradient allclose (BASELINE config 4 verification harness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsconverter_tpu.render import Camera, render, render_reference, psnr
from gsconverter_tpu.render.project import covariance_3d, quat_to_rotmat
from tests.conftest import make_cloud


def scene(n=300, seed=0, sh_degree=2):
    c = make_cloud(n, sh_degree=sh_degree, seed=seed)
    # compact scene in front of the camera
    c = c.replace(
        pos=c.pos * 0.5,
        log_scale=jnp.clip(c.log_scale, -5.0, -2.0),
        opacity=jnp.clip(c.opacity, -3.0, 3.0),
    )
    cam = Camera.look_at(eye=(0, 0, -6), target=(0, 0, 0), width=64, height=64)
    return c, cam


def test_quat_to_rotmat_orthonormal():
    c = make_cloud(50)
    R = np.asarray(quat_to_rotmat(c.quat))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_covariance_psd():
    c = make_cloud(50)
    cov = np.asarray(covariance_3d(c.log_scale, c.quat))
    ev = np.linalg.eigvalsh(cov)
    assert np.all(ev > 0)


def test_tiled_matches_reference_forward():
    c, cam = scene()
    img_t = np.asarray(render(c, cam, max_per_tile=300))
    img_r = np.asarray(render_reference(c, cam))
    assert float(psnr(jnp.asarray(img_t), jnp.asarray(img_r))) > 40.0
    np.testing.assert_allclose(img_t, img_r, atol=5e-3)


def test_render_nonempty_and_bounded():
    c, cam = scene()
    img = np.asarray(render(c, cam))
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01  # something rendered


def test_pixel_gradients_match_reference():
    c, cam = scene(n=100)
    target = jnp.ones((64, 64, 3)) * 0.5

    def loss_tiled(pos, opacity, sh_dc, log_scale, quat):
        cc = c.replace(pos=pos, opacity=opacity, sh_dc=sh_dc,
                       log_scale=log_scale, quat=quat)
        return jnp.mean((render(cc, cam, max_per_tile=128) - target) ** 2)

    def loss_ref(pos, opacity, sh_dc, log_scale, quat):
        cc = c.replace(pos=pos, opacity=opacity, sh_dc=sh_dc,
                       log_scale=log_scale, quat=quat)
        return jnp.mean((render_reference(cc, cam) - target) ** 2)

    args = (c.pos, c.opacity, c.sh_dc, c.log_scale, c.quat)
    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gt, gr, name in zip(g_t, g_r, ["pos", "opacity", "sh_dc", "log_scale", "quat"]):
        scale = np.maximum(np.abs(np.asarray(gr)).max(), 1e-12)
        np.testing.assert_allclose(
            np.asarray(gt) / scale, np.asarray(gr) / scale, atol=2e-3,
            err_msg=f"gradient mismatch for {name}",
        )


def test_gradients_nonzero():
    c, cam = scene(n=100)

    def loss(opacity):
        return jnp.mean(render(c.replace(opacity=opacity), cam) ** 2)

    g = np.asarray(jax.grad(loss)(c.opacity))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_conversion_verified_by_rendered_psnr(tmp_path):
    """The north-star check: a lossy conversion verified by rendered PSNR
    rather than byte diffs (BASELINE.json)."""
    from gsconverter_tpu.formats import get_handler

    c, cam = scene(n=400)
    h = get_handler("spz")
    path = str(tmp_path / "t.spz")
    h.write(c, path)
    d = get_handler("spz").read(path)
    img_a = render(c, cam)
    img_b = render(d, cam)
    assert float(psnr(img_a, img_b)) > 30.0


def test_windowed_binning_matches_exact():
    c, cam = scene(n=400)
    img_e = np.asarray(render(c, cam, max_per_tile=400, binning="exact"))
    img_w = np.asarray(render(c, cam, max_per_tile=400, binning="windowed"))
    # identical selection policy when budget covers everything and no splat
    # exceeds the 6x6-tile clamp
    assert float(psnr(jnp.asarray(img_w), jnp.asarray(img_e))) > 40.0


def test_windowed_binning_gradients():
    c, cam = scene(n=200)

    def loss(opacity):
        return jnp.mean(
            render(c.replace(opacity=opacity), cam, binning="windowed") ** 2
        )

    g = np.asarray(jax.grad(loss)(c.opacity))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_fit_reduces_loss():
    from gsconverter_tpu.render.train import fit

    c, cam = scene(n=120)
    target = np.asarray(render(c, cam))
    # perturb and recover
    import jax.numpy as jnp
    perturbed = c.replace(sh_dc=c.sh_dc + 0.3, opacity=c.opacity - 0.5)
    fitted, losses = fit(perturbed, cam, jnp.asarray(target), steps=30, lr=2e-2,
                         max_per_tile=128)
    assert losses[-1] < losses[0] * 0.5


def test_windowed_giant_splat_not_truncated():
    """A near-camera splat covering far more than 6x6 tiles must keep its
    full footprint via the global-candidate escape (VERDICT r1 item 7)."""
    c, _ = scene(64)
    cam = Camera.look_at(
        eye=(0, 0, -6), target=(0, 0, 0), width=128, height=128
    )
    # one giant: huge scale, in front of everything
    pos = np.array(c.pos)
    pos[0] = [0.0, 0.0, -4.0]  # 2 units from the camera
    ls = np.array(c.log_scale)
    ls[0] = [0.3, 0.3, 0.3]  # exp(0.3) ~ 1.35 world units at depth 2
    op = np.array(c.opacity)
    op[0] = 2.0
    c = c.replace(
        pos=jnp.asarray(pos), log_scale=jnp.asarray(ls), opacity=jnp.asarray(op)
    )
    img_ref = np.asarray(render_reference(c, cam))
    img_w = np.asarray(render(c, cam, max_per_tile=400, binning="windowed"))
    p = float(psnr(jnp.asarray(img_w), jnp.asarray(img_ref)))
    assert p > 38.0, p
    # corner pixels (far outside any 6x6-tile window around the giant's
    # center) must carry the giant's contribution
    assert abs(float(img_w[0, 0, 0]) - float(img_ref[0, 0, 0])) < 2e-2
    assert abs(float(img_w[-1, -1, 1]) - float(img_ref[-1, -1, 1])) < 2e-2


def test_auto_budget_sizes_and_reports():
    """auto_budget (VERDICT r3 item 3): pow2 budgets covering the measured
    occupancy, zero truncation when uncapped, and an honest saturation
    report when the cap binds."""
    from gsconverter_tpu.render.rasterizer import auto_budget

    c, cam = scene(n=600)
    # occupancy-only sizing (saturation off): budget covers the raw counts
    b0 = auto_budget(c, cam, saturation=False)
    assert b0["max_per_tile"] >= b0["occ_max"] or b0["max_per_tile"] == 1024
    assert b0["truncated_tiles"] == 0
    # saturation-aware sizing (default): per-tile need is capped at
    # 2*saturation_depth+32, so the budget may sit below occ_max — but
    # nothing saturation-justified may be cut silently
    b = auto_budget(c, cam)
    assert b["max_per_tile"] <= b0["max_per_tile"]
    assert b["sat_max"] is not None and b["sat_max"] >= 0
    assert b["truncated_tiles"] == 0
    # force the cap to bind and check it is reported, not hidden
    b2 = auto_budget(c, cam, cap=32, saturation=False)
    assert b2["max_per_tile"] == 32
    if b0["occ_max"] > 32:
        assert b2["truncated_tiles"] > 0


def structured_scene(n=100_000, seed=7):
    """Depth-stratified clusters + a wall of near-camera giants — the
    adversarial occupancy profile for windowed binning (VERDICT r4 item 7):
    dense far clusters stress per-tile budgets, mid-size (1-3 tile) splats
    stress the compacted span-7 tier, true giants stress the global escape."""
    rr = np.random.default_rng(seed)
    n_giant, n_mid = 40, 1_500
    n_bg = n - n_giant - n_mid
    # four depth-stratified clusters of pixel-scale splats
    centers = np.array([[0, 0, 0], [0.8, 0.4, 1.5], [-0.6, -0.3, 3.0],
                        [0.2, -0.6, 4.5]], np.float32)
    pos_bg = (centers[rr.integers(0, 4, n_bg)]
              + rr.normal(0, 0.5, (n_bg, 3))).astype(np.float32)
    ls_bg = rr.normal(-5.0, 0.3, (n_bg, 3)).astype(np.float32)
    # mid tier: 1-3-tile footprints scattered through the volume
    pos_mid = rr.normal(0, 1.2, (n_mid, 3)).astype(np.float32)
    ls_mid = rr.normal(-2.6, 0.2, (n_mid, 3)).astype(np.float32)
    # near-camera giants (camera at z=5 looking at origin)
    pos_g = np.stack([
        rr.uniform(-1, 1, n_giant), rr.uniform(-1, 1, n_giant),
        rr.uniform(3.2, 4.0, n_giant),
    ], axis=1).astype(np.float32)
    ls_g = rr.normal(-0.8, 0.2, (n_giant, 3)).astype(np.float32)
    c = make_cloud(n, sh_degree=0, seed=seed)
    c = c.replace(
        pos=jnp.asarray(np.concatenate([pos_bg, pos_mid, pos_g])),
        log_scale=jnp.asarray(np.concatenate([ls_bg, ls_mid, ls_g])),
        opacity=jnp.asarray(
            np.concatenate([
                rr.normal(-1, 1, n_bg), rr.normal(0, 1, n_mid),
                rr.normal(1.5, 0.5, n_giant),
            ]).astype(np.float32)),
    )
    cam = Camera.look_at(eye=(0, 0, 5.0), target=(0, 0, 0), fov_deg=40.0,
                         width=64, height=64)
    return c, cam


def test_structured_scene_crop_psnr_and_no_truncation():
    """At-scale windowed-vs-exact quality check IN the test suite (VERDICT
    r4 item 7): a 100k structured scene, auto-budgeted windowed render vs
    the exact-selection oracle, >= 35 dB with zero big-splat truncation
    under the auto budget."""
    from gsconverter_tpu.render.rasterizer import auto_budget

    c, cam = structured_scene()
    # glob_cap raised to cover this scene's near-camera population (the
    # z=4.5 cluster sits almost on the camera plane — hundreds of splats
    # blow past the 3-tile mid cap); auto_budget sizes g to the need
    b = auto_budget(c, cam, cap=16384, glob_cap=1024)
    assert b["big_truncated"] == 0, b
    img_w = render(c, cam, binning="windowed",
                   max_per_tile=b["max_per_tile"],
                   max_global=b["max_global"], tile_chunk=16)
    img_e = render(c, cam, binning="exact",
                   max_per_tile=b["max_per_tile"], tile_chunk=16)
    p = float(psnr(img_w, img_e))
    assert p >= 35.0, (p, b)


def test_banded_render_matches_plain():
    """Occupancy-banded scheduling is a pure re-ordering: band budgets
    cover each band's tiles, so the image must match the flat windowed
    render to float tolerance."""
    from gsconverter_tpu.render.rasterizer import auto_budget

    c, cam = structured_scene(n=20_000)
    # saturation=False: band budgets cover raw counts, so banded and flat
    # make the SAME per-tile selection — pure re-ordering
    b = auto_budget(c, cam, cap=16384, band_chunk=2, saturation=False)
    img_flat = render(c, cam, binning="windowed",
                      max_per_tile=b["max_per_tile"],
                      max_global=b["max_global"], tile_chunk=4)
    img_band = render(c, cam, binning="windowed",
                      max_global=b["max_global"], tile_chunk=2,
                      tile_order=jnp.asarray(b["tile_order"]),
                      band_plan=b["band_plan"])
    assert float(psnr(img_band, img_flat)) > 50.0
    # gradients flow through the banded path
    def loss(op):
        return jnp.sum(render(c.replace(opacity=op), cam, binning="windowed",
                              max_global=b["max_global"], tile_chunk=2,
                              tile_order=jnp.asarray(b["tile_order"]),
                              band_plan=b["band_plan"]) ** 2)
    g = np.asarray(jax.grad(loss)(c.opacity))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_windowed_crop_psnr_at_scale():
    """Scaled-down version of the bench-scene crop check (the real 1M/1080p
    crop PSNR is measured on hardware by bench.py): a dense random cloud,
    auto-budgeted windowed binning vs the exact-selection oracle on a crop,
    >= 35 dB (VERDICT r3 item 3 quality bar)."""
    from gsconverter_tpu.render.rasterizer import auto_budget

    rr = np.random.default_rng(3)
    # density matched to the bench scene (~360 candidates/tile mean at
    # 1M/1080p), scaled to a 4x4-tile viewport
    n = 6_000
    c = make_cloud(n, sh_degree=0, seed=3)
    c = c.replace(
        pos=jnp.asarray(rr.normal(0, 1.0, (n, 3)).astype(np.float32)),
        log_scale=jnp.asarray(rr.normal(-5.0, 0.3, (n, 3)).astype(np.float32)),
        opacity=jnp.asarray(rr.normal(-1, 1, (n,)).astype(np.float32)),
    )
    cam = Camera.look_at(eye=(0, 0, 5.0), target=(0, 0, 0), fov_deg=60.0,
                         width=64, height=64)
    b = auto_budget(c, cam, cap=4096)
    img_w = render(c, cam, binning="windowed",
                   max_per_tile=b["max_per_tile"], max_global=b["max_global"])
    img_e = render(c, cam, binning="exact", max_per_tile=b["max_per_tile"])
    assert float(psnr(img_w, img_e)) >= 35.0
