"""Benchmark harness — runs on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): Msplats/sec for the SOR + K-Means hot path
per chip.  ``vs_baseline`` is measured against the reference's CPU fallback
algorithms (scipy cKDTree SOR + sklearn MiniBatchKMeans — the exact code
paths at /root/reference/gsconverter/processing/data_processor.py:155-174 and
gpu_ops.py:48-52) on this host, scaled to the same workload.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, warmup=2, iters=5):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def _cache():
    from gsconverter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()


def bench_tpu(n_sor=2_000_000, n_km=1_000_000, d_km=24, k_km=1024):
    import jax
    import jax.numpy as jnp

    from gsconverter_tpu.ops import kmeans as km
    from gsconverter_tpu.ops.sor import sor_mask

    dev = jax.devices()[0]
    log(f"device: {dev}")
    r = np.random.default_rng(0)

    # ---- SOR on a realistic scene (clustered + noise) ----
    pos = r.normal(0, 3.0, (n_sor, 3)).astype(np.float32)
    pos_d = jax.device_put(jnp.asarray(pos), dev)

    def run_sor():
        jax.block_until_ready(sor_mask(pos_d, k=25, sigma=10.5))

    t_sor = timeit(run_sor, warmup=1, iters=3)
    sor_rate = n_sor / t_sor / 1e6
    log(f"SOR: {t_sor*1e3:.1f} ms for {n_sor} splats -> {sor_rate:.1f} Msplats/s")

    # ---- K-Means (SOG shN palette config: D=24) ----
    x = r.normal(0, 1.0, (n_km, d_km)).astype(np.float32)
    x_d = jax.device_put(jnp.asarray(x), dev)
    init = km.init_centroids(x_d, k_km, jax.random.PRNGKey(0))

    def run_km():
        c, labels = km._kmeans_jit(x_d, init, k_km, 10, "pallas")
        jax.block_until_ready(labels)

    t_km = timeit(run_km, warmup=1, iters=3)
    km_rate = n_km * 10 / t_km / 1e6  # assign+update iterations per second
    log(f"KMeans(D={d_km},K={k_km},10 iters): {t_km*1e3:.1f} ms -> {km_rate:.1f} Msplat-iters/s")

    return sor_rate, km_rate


def bench_reference_cpu(n=200_000):
    """Reference CPU-fallback algorithms on the same host (smaller N, scaled)."""
    from scipy.spatial import cKDTree
    from sklearn.cluster import MiniBatchKMeans
    import multiprocessing

    r = np.random.default_rng(0)
    pos = r.normal(0, 3.0, (n, 3)).astype(np.float32)

    t0 = time.perf_counter()
    tree = cKDTree(pos)
    dists, _ = tree.query(pos, k=26, workers=max(1, multiprocessing.cpu_count() - 1))
    md = dists[:, 1:].mean(axis=1)
    _ = md < md.mean() + 10.5 * md.std()
    t_sor = time.perf_counter() - t0
    sor_rate = n / t_sor / 1e6
    log(f"reference CPU SOR: {t_sor*1e3:.1f} ms for {n} -> {sor_rate:.2f} Msplats/s")

    nk = 100_000
    x = r.normal(0, 1.0, (nk, 24)).astype(np.float32)
    t0 = time.perf_counter()
    MiniBatchKMeans(n_clusters=1024, max_iter=10, batch_size=16384, n_init="auto").fit(x)
    t_km = time.perf_counter() - t0
    km_rate = nk * 10 / t_km / 1e6
    log(f"reference CPU KMeans: {t_km*1e3:.1f} ms -> {km_rate:.2f} Msplat-iters/s")
    return sor_rate, km_rate


def main():
    _cache()
    sor_rate, km_rate = bench_tpu()
    try:
        ref_sor, ref_km = bench_reference_cpu()
        vs = float(2.0 / (1.0 / (sor_rate / ref_sor) + 1.0 / (km_rate / ref_km)))
    except Exception as e:  # reference baseline unavailable
        log(f"baseline measurement failed: {e}")
        vs = float("nan")
    # combined headline: harmonic mean of the two hot-path rates
    combined = 2.0 / (1.0 / sor_rate + 1.0 / km_rate)
    print(json.dumps({
        "metric": "sor_kmeans_msplats_per_chip",
        "value": round(float(combined), 2),
        "unit": "Msplats/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
