"""Bisect the large-N SOR TPU kernel fault: run each size-dependent piece
at the failing size in isolated subprocesses, stopping at the first fault.

Usage: python tools/bisect_tpu_fault.py [n]
Run ONLY when the device is healthy — a fault wedges it for a long time.
"""
import subprocess
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152

CHILD = r'''
import sys
from gsconverter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
piece = sys.argv[1]; n = int(sys.argv[2])
r = np.random.default_rng(0)
pos = jnp.asarray(r.normal(0, 3.0, (n, 3)).astype(np.float32))
valid = jnp.ones(n, bool)
import gsconverter_tpu.ops.sor as S

if piece == "health":
    out = jnp.sum(pos)
elif piece == "argsort":
    keys = (jnp.clip(pos[:,0]*10,0,1023).astype(jnp.int32) << 20)
    out = jnp.argsort(keys)
elif piece == "scatter":
    order = jnp.argsort(pos[:, 0])
    out = jnp.zeros(n, jnp.float32).at[order].set(pos[:, 1])
elif piece == "segsum":
    cid = jnp.clip((pos[:, 0] * 100).astype(jnp.int32) % n, 0, n - 1)
    out = jax.ops.segment_sum(jnp.ones(n, jnp.float32), cid, num_segments=n)
elif piece == "nanmedian":
    out = jnp.nanmedian(jnp.where(valid, pos[:, 0], jnp.nan))
elif piece == "adaptive_cell":
    mins = jnp.min(pos, axis=0); extent = jnp.max(pos,axis=0) - mins
    out = jax.jit(S._adaptive_cell_size)(pos, valid, mins, extent)
elif piece == "md":
    out = S._sor_md_masked(pos, valid, 25, 64, 2048)
elif piece == "mask":
    out = S.sor_mask(pos, 25, 10.5)
else:
    raise SystemExit("unknown piece")
jax.block_until_ready(out)
print("OK", piece)
'''

PIECES = ["health", "argsort", "scatter", "segsum", "nanmedian",
          "adaptive_cell", "md", "mask", "health"]

for piece in PIECES:
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, piece, str(N)],
            capture_output=True, text=True, timeout=2400,
        )
        ok = f"OK {piece}" in out.stdout
        print(f"{piece}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            print(out.stderr.strip()[-500:])
            break
    except subprocess.TimeoutExpired:
        print(f"{piece}: TIMEOUT (device wedged?)", flush=True)
        break
