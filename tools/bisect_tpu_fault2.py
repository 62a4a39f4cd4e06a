"""Second-stage bisect: isolate which op inside _sor_md_impl's block loop
faults at large N.  Each piece replicates the loop with ONE op active.

Usage: python tools/bisect_tpu_fault2.py <n> <piece>
Pieces: md | loop_search | loop_gather | loop_topk | loop_nosearch
"""
import subprocess
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
ONLY = sys.argv[2] if len(sys.argv) > 2 else None

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
block, cap = 2048, 64

if piece == "md":
    out = S._sor_md_masked(pos, valid, 25, cap, block)
elif piece == "md_approx":
    out = S._sor_md_masked(pos, valid, 25, cap, block, approx=True)
else:
    @jax.jit
    def run(pos):
        keys = jnp.clip((pos[:, 0] + 20) * 25, 0, 1023).astype(jnp.int32) << 20
        order = jnp.argsort(keys)
        skeys = keys[order]
        spos = pos[order]
        nb = n // block

        def one_block(bpos):
            # synth 27 query keys per point
            nkeys = (bpos[:, :1] * 0).astype(jnp.int32) + jnp.arange(27)[None, :] * 1000
            if piece in ("loop_search", "loop_topk_search"):
                start = jnp.searchsorted(skeys, nkeys.reshape(-1)).reshape(nkeys.shape)
            else:
                start = nkeys % (n - cap)
            idx = (start[..., None] + jnp.arange(cap)[None, None, :]).reshape(block, 27 * cap)
            idx = jnp.clip(idx, 0, n - 1)
            if piece == "loop_search":
                return jnp.sum(idx, axis=1).astype(jnp.float32)
            cand = spos[idx]
            d2 = jnp.sum((cand - bpos[:, None, :]) ** 2, axis=-1)
            if piece == "loop_gather":
                return jnp.sum(d2, axis=1)
            neg, _ = jax.lax.top_k(-d2, 25)
            return jnp.mean(-neg, axis=1)

        md = jax.lax.map(one_block, spos.reshape(nb, block, 3)).reshape(-1)
        return jnp.zeros(n, jnp.float32).at[order].set(md)

    out = run(pos)
jax.block_until_ready(out)
print("OK", piece)
'''

PIECES = [ONLY] if ONLY else ["loop_search", "loop_gather", "loop_topk", "md_approx", "md"]
for piece in PIECES:
    try:
        out = subprocess.run([sys.executable, "-c", CHILD, piece, str(N)],
                             capture_output=True, text=True, timeout=2400)
        ok = f"OK {piece}" in out.stdout
        print(f"{piece} @ {N}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            print(out.stderr.strip()[-400:])
            break
    except subprocess.TimeoutExpired:
        print(f"{piece} @ {N}: TIMEOUT", flush=True)
        break
