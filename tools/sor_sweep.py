import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
from gsconverter_tpu.ops.sor import sor_mask

def sync(x):
    if x.dtype == bool: x = x.astype(jnp.int32)
    return float(jnp.sum(x))

n = 4_194_304
r = np.random.default_rng(0)
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
sync(pos)

# adversarial quality scene (two blobs + bridge flyers), 200k
rq = np.random.default_rng(23)
qa = rq.normal(0, 0.5, (100000, 3)).astype(np.float32)
qb = (rq.normal(0, 0.5, (100000, 3)) + [12, 0, 0]).astype(np.float32)
t = rq.uniform(0.15, 0.85, (600, 1)).astype(np.float32)
qbr = (t * [12, 0, 0] + rq.normal(0, 0.15, (600, 3))).astype(np.float32)
qpos = np.concatenate([qa, qb, qbr])
from scipy.spatial import cKDTree
kq, sq = 25, 2.0
dists, _ = cKDTree(qpos).query(qpos, k=kq + 1, workers=8)
mdq = dists[:, 1:].mean(axis=1)
mask_ref = mdq < mdq.mean() + sq * mdq.std()
qj = jnp.asarray(qpos)

for impl, passes, window in [("pallas",2,512), ("pallas",2,256), ("pallas",1,512),
                             ("pallas",3,256), ("xla",2,256)]:
    try:
        f = lambda: sync(sor_mask(pos, k=25, sigma=10.5, impl=impl,
                                  passes=passes, window=window))
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
        dt = min(ts)
        m = np.asarray(sor_mask(qj, k=kq, sigma=sq, impl=impl,
                                passes=passes, window=window))
        agree = (m == mask_ref).mean()
        print(f"{impl} p{passes} w{window}: {dt*1e3:.0f} ms {n/dt/1e6:.1f} Msplats/s  kdtree-agree={agree:.4f} flyers-kept={m[-600:].mean():.3f}", flush=True)
    except Exception as e:
        print(f"{impl} p{passes} w{window}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
