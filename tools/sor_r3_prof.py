"""Round-3 SOR tuning: xla vs pallas, block size, binary-search iters.

Run ALONE on the chip (the axon tunnel wedges under concurrent clients):
    python tools/sor_r3_prof.py [n]
"""

import sys
import time

import numpy as np

from gsconverter_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gsconverter_tpu.ops import sor  # noqa: E402


def sync(x):
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))


def timeit(f, iters=3):
    f()
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    r = np.random.default_rng(0)
    pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
    sync(pos)

    for name, kw in [
        ("xla p1", dict(impl="xla", passes=1)),
        ("pallas p1 blk512 it10", dict(impl="pallas", passes=1)),
        ("xla p2", dict(impl="xla", passes=2)),
        ("pallas p2", dict(impl="pallas", passes=2)),
    ]:
        try:
            dt = timeit(lambda kw=kw: sync(
                sor.sor_mask(pos, k=25, sigma=10.5, **kw)))
            print(f"{name}: {dt*1e3:.0f} ms -> {n/dt/1e6:.1f} Msplats/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # stage split: sort+key traffic vs window loop
    valid = jnp.ones(n, bool)
    key = sor._morton_key(pos, valid, None, (0.0, 0.0, 0.0))
    f_sort = jax.jit(lambda: jax.lax.sort(
        (key, pos[:, 0], pos[:, 1], pos[:, 2],
         jnp.arange(n, dtype=jnp.int32), jnp.zeros(n)), num_keys=1)[1])
    dt = timeit(lambda: sync(f_sort()))
    print(f"variadic 6-array sort: {dt*1e3:.0f} ms", flush=True)

    spos = jnp.sort(pos, axis=0)  # stand-in morton-sorted layout
    sync(spos)
    for blk, iters in [(512, 10), (512, 8), (1024, 10), (1024, 8), (2048, 8)]:
        try:
            dt = timeit(lambda b=blk, it=iters: sync(
                sor._sor_window_loop_pallas(spos, 25, 512, b, iters=it)))
            print(f"pallas loop blk{blk} it{iters}: {dt*1e3:.0f} ms "
                  f"-> {n/dt/1e6:.1f} Msplats/s", flush=True)
        except Exception as e:
            print(f"pallas loop blk{blk} it{iters}: FAIL "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
    dt = timeit(lambda: sync(sor._sor_window_loop(
        spos, jnp.ones(n, bool), 25, 512, 1024, True)))
    print(f"xla loop blk1024: {dt*1e3:.0f} ms -> {n/dt/1e6:.1f} Msplats/s",
          flush=True)


if __name__ == "__main__":
    main()
