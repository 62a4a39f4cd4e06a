"""K-Means op tests: XLA vs Pallas-interpret parity + clustering quality."""

import numpy as np
import jax.numpy as jnp

from gsconverter_tpu.ops import kmeans as km


def test_assign_parity_pallas_interpret():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 1, (700, 9)).astype(np.float32))
    c = jnp.asarray(r.normal(0, 1, (37, 9)).astype(np.float32))
    a = np.asarray(km.assign(x, c, impl="xla"))
    b = np.asarray(km.assign(x, c, impl="pallas_interpret"))
    np.testing.assert_array_equal(a, b)


def test_assign_correctness_bruteforce():
    r = np.random.default_rng(1)
    x = r.normal(0, 1, (200, 3)).astype(np.float32)
    c = r.normal(0, 1, (17, 3)).astype(np.float32)
    expect = np.argmin(((x[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1)
    got = np.asarray(km.assign(jnp.asarray(x), jnp.asarray(c), impl="xla"))
    np.testing.assert_array_equal(got, expect)


def test_kmeans_recovers_clusters():
    r = np.random.default_rng(2)
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = np.concatenate(
        [r.normal(0, 0.3, (250, 2)).astype(np.float32) + c for c in centers]
    )
    c, labels = km.kmeans(x, 4, max_iter=10, seed=0)
    c = np.asarray(c)
    # every true center has a found centroid within 0.3
    for t in centers:
        assert np.min(np.linalg.norm(c - t, axis=1)) < 0.3
    assert len(np.unique(np.asarray(labels))) == 4


def test_kmeans_k_ge_n():
    x = np.random.default_rng(0).normal(0, 1, (10, 2)).astype(np.float32)
    c, l = km.kmeans(x, 20)
    np.testing.assert_allclose(np.asarray(c), x)
    np.testing.assert_array_equal(np.asarray(l), np.arange(10))


def test_kmeans_scalar_1d():
    """The SOG scalar-codebook path: D=1, K=256."""
    r = np.random.default_rng(3)
    x = r.normal(-4, 1, 5000).astype(np.float32)
    c, labels = km.kmeans(x, 256, max_iter=10)
    recon = np.asarray(c).reshape(-1)[np.asarray(labels)]
    assert np.mean(np.abs(recon - x)) < 0.05


def test_kmeans_chunked():
    from gsconverter_tpu.ops.kmeans import kmeans_chunked

    r = np.random.default_rng(5)
    x = r.normal(0, 1, (3000, 9)).astype(np.float32)
    c, labels = kmeans_chunked(x, num_chunks=4, k_per_chunk=32, max_iter=8)
    assert c.shape == (128, 9)
    assert labels.shape == (3000,)
    # each point's label lands in its own chunk's palette slice
    chunk = -(-3000 // 4)
    from gsconverter_tpu.ops.padding import next_pow2
    chunk = next_pow2(chunk, floor=256)
    cid = np.arange(3000) // chunk
    assert np.all((np.asarray(labels) // 32) == cid)
    # reconstruction is reasonable
    recon = np.asarray(c)[np.asarray(labels)]
    base = np.mean((x - x.mean(0)) ** 2)
    assert np.mean((recon - x) ** 2) < base * 0.7


def test_lloyd_step_parity_pallas_interpret():
    """Fused Lloyd kernel (f32) matches the blocked XLA fallback exactly."""
    r = np.random.default_rng(7)
    x = jnp.asarray(r.normal(0, 1, (900, 24)).astype(np.float32))
    c = jnp.asarray(r.normal(0, 1, (130, 24)).astype(np.float32))
    nv = jnp.int32(850)  # rows >= 850 are "padding"
    s1, n1, l1 = km.lloyd_step(x, c, 130, n_valid=nv, impl="xla")
    s2, n2, l2 = km.lloyd_step(x, c, 130, n_valid=nv,
                               impl="pallas_interpret", precision="f32")
    np.testing.assert_array_equal(np.asarray(l1)[:850], np.asarray(l2)[:850])
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5,
                               atol=1e-4)


def test_lloyd_step_bf16_quality():
    """bf16 matmuls: labels ~match f32 and the implied inertia is equal to
    within bf16 input rounding."""
    r = np.random.default_rng(8)
    x = r.normal(0, 1, (2000, 9)).astype(np.float32)
    c = x[r.choice(2000, 64, replace=False)]
    _, _, lf = km.lloyd_step(jnp.asarray(x), jnp.asarray(c), 64, impl="xla")
    _, _, lb = km.lloyd_step(jnp.asarray(x), jnp.asarray(c), 64,
                             impl="pallas_interpret", precision="bf16")
    lf, lb = np.asarray(lf), np.asarray(lb)
    agree = (lf == lb).mean()
    assert agree > 0.97, agree
    # where they disagree, the bf16 choice is nearly as close (ties)
    d_f = ((x - c[lf]) ** 2).sum(1)
    d_b = ((x - c[lb]) ** 2).sum(1)
    assert float(np.mean(d_b - d_f)) < 1e-3
