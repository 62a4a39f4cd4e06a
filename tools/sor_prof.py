import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

def sync(x):
    if x.dtype == bool:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))

from gsconverter_tpu.ops.sor import sor_mask

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
impl = sys.argv[2] if len(sys.argv) > 2 else "pallas"
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
r = np.random.default_rng(0)
tiny = jnp.asarray(r.normal(0, 3.0, (8192, 3)).astype(np.float32))
t0=time.perf_counter()
sync(sor_mask(tiny, k=25, sigma=10.5, impl=impl, passes=passes))
print(f"tiny probe ok {time.perf_counter()-t0:.1f}s", flush=True)
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
sync(pos)
t0=time.perf_counter()
sync(sor_mask(pos, k=25, sigma=10.5, impl=impl, passes=passes))
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
ts=[]
for _ in range(3):
    t0=time.perf_counter()
    sync(sor_mask(pos, k=25, sigma=10.5, impl=impl, passes=passes))
    ts.append(time.perf_counter()-t0)
dt=min(ts)
print(f"impl={impl} passes={passes} n={n}: {dt*1e3:.0f} ms -> {n/dt/1e6:.1f} Msplats/s", flush=True)
