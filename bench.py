"""Benchmark harness — runs on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): Msplats/sec for the SOR + K-Means hot path
per chip.  ``vs_baseline`` measures against the reference's CPU fallback
algorithms (scipy cKDTree SOR + sklearn MiniBatchKMeans — the exact code
paths at /root/reference/gsconverter/processing/data_processor.py:155-174
and gpu_ops.py:48-52) on this host, scaled to the same workload.

Each TPU workload runs in its own subprocess: this environment's TPU tunnel
can fault and wedge on large programs, and isolation guarantees the driver
always gets its JSON line.  Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# The fused Morton-window SOR runs clean at 4M on this device (the old
# gather-heavy grid program faulted at N>=1M — see bench_diag notes).
N_SOR = 4_194_304
N_KM, D_KM, K_KM = 1_048_576, 24, 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_CHILD = r"""
import sys, time, json
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

# NOTE: on this environment's axon tunnel, block_until_ready returns before
# the device work is done — a host-side scalar readback is the only reliable
# sync point, so every timed call ends in float(jnp.sum(...)).
def sync(x):
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))

kind = sys.argv[1]
r = np.random.default_rng(0)
if kind == "sor":
    from gsconverter_tpu.ops.sor import sor_mask
    n = int(sys.argv[2])
    # tiny probe first: validates the program family on-device cheaply
    tiny = jnp.asarray(r.normal(0, 3.0, (4096, 3)).astype(np.float32))
    sync(sor_mask(tiny, k=25, sigma=10.5))
    pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
    sync(pos)  # materialize input on device before timing
    f = lambda: sync(sor_mask(pos, k=25, sigma=10.5))
    per_call = n
elif kind == "kmeans":
    from gsconverter_tpu.ops import kmeans as km
    n, d, k = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    tiny = jnp.asarray(r.normal(0, 1.0, (4096, d)).astype(np.float32))
    sync(km.kmeans(tiny, 64, max_iter=2)[1])
    x = jnp.asarray(r.normal(0, 1.0, (n, d)).astype(np.float32))
    sync(x)
    f = lambda: sync(km.kmeans(x, k, max_iter=10)[1])
    per_call = n * 10
else:
    raise SystemExit(f"unknown kind {kind}")

f()  # compile + warm
t0 = time.perf_counter()
iters = 3
for _ in range(iters):
    f()
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"rate": per_call / dt / 1e6, "secs": dt}))
"""


def run_tpu_workload(args: list[str], timeout: int = 1800) -> float | None:
    """Run one workload in a subprocess; returns Msplats/s or None."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, *args],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                r = json.loads(line)
                log(f"{args}: {r['rate']:.1f} Msplats/s ({r['secs']*1e3:.0f} ms/call)")
                return float(r["rate"])
        log(f"{args}: no result; stderr tail: {out.stderr.strip()[-400:]}")
    except subprocess.TimeoutExpired:
        log(f"{args}: timeout")
    except Exception as e:
        log(f"{args}: {e}")
    return None


def bench_reference_cpu(n=200_000):
    """Reference CPU-fallback algorithms on the same host (scaled workload)."""
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
    x = r.normal(0, 1.0, (nk, D_KM)).astype(np.float32)
    t0 = time.perf_counter()
    MiniBatchKMeans(n_clusters=K_KM, max_iter=10, batch_size=16384, n_init="auto").fit(x)
    t_km = time.perf_counter() - t0
    km_rate = nk * 10 / t_km / 1e6
    log(f"reference CPU KMeans: {t_km*1e3:.1f} ms -> {km_rate:.2f} Msplat-iters/s")
    return sor_rate, km_rate


def main():
    sor_rate = run_tpu_workload(["sor", str(N_SOR)])
    km_rate = run_tpu_workload(["kmeans", str(N_KM), str(D_KM), str(K_KM)])

    vs = None
    combined = 0.0
    if sor_rate and km_rate:
        combined = 2.0 / (1.0 / sor_rate + 1.0 / km_rate)
        try:
            ref_sor, ref_km = bench_reference_cpu()
            vs = round(
                2.0 / (1.0 / (sor_rate / ref_sor) + 1.0 / (km_rate / ref_km)), 2
            )
        except Exception as e:
            log(f"baseline measurement failed: {e}")
    elif sor_rate or km_rate:
        combined = sor_rate or km_rate
        log("partial result: one workload failed")
    else:
        log("TPU workloads failed (device unavailable?)")

    print(json.dumps({
        "metric": "sor_kmeans_msplats_per_chip",
        "value": round(float(combined), 2),
        "unit": "Msplats/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
