"""Multi-chip algorithms: sharded SOR with halo exchange, distributed
K-Means, depth-ordered sharded rendering.

Reference analogue: none (SURVEY.md §2.4 — the reference is single-process).
These are the TPU-native designs the north star specifies:

  - **sharded SOR**: global device sort by x-major cell key (XLA distributed
    sort) so each shard owns a spatially contiguous slab; boundary slabs are
    exchanged with ring ``ppermute`` (the halo); each shard runs the
    single-chip grid kernel over [halo | local | halo]; global mu/sigma via
    ``psum``.
  - **distributed K-Means**: per-shard MXU assign; centroid sums + counts
    ``psum``'d across chips each Lloyd iteration.
  - **sharded render**: splats depth-sorted globally, each shard composites
    its depth-contiguous chunk into a partial (color, transmittance) image;
    the over-operator is associative, so shard images fold in shard order
    after an ``all_gather``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import kmeans as km


# ------------------------------------------------------------- sharded SOR


def sharded_sor_mask(
    pos: jax.Array,
    mesh: Mesh,
    k: int = 25,
    sigma: float = 10.5,
    halo: int = 4096,
    axis: str = "data",
    passes: int | None = None,
    window: int | None = None,
    iters: int | None = None,
) -> jax.Array:
    """Keep-mask over positions [N,3], computed over the device mesh.

    Parity-by-construction with the single-device window method
    (ops/sor.py): every ensemble pass performs the SAME global Morton sort
    (XLA distributed sort) the single-device path performs, shards own
    contiguous slabs of the sorted order, and ``window``-wide candidate
    context across slab boundaries comes from a ring-``ppermute`` halo
    exchange.  Shard slabs and the halo are rounded to the window loop's
    block size, so per-shard block boundaries coincide with the
    single-device partition — per-point mean-KNN distances are numerically
    IDENTICAL to the single-device kernel for every point (halo >= window
    guarantees full candidate context; ring-end halos are scrubbed to the
    PAD_POS sentinel exactly like the single-device array ends).  The only
    remaining divergence is the reduction order of the global mu/sigma.

    Any N is accepted: padded internally with sentinel rows that sort to
    the tail and are excluded from candidates and statistics.  The returned
    mask is in the ORIGINAL input order.
    """
    from ..ops.padding import PAD_POS
    from ..ops.sor import (_PASS_ORDERS, _morton_key, _sor_window_loop,
                           _sor_window_loop_pallas, _D_VALID_MAX, MAX_K,
                           _PALLAS_BLOCK, resolve_window)

    n = pos.shape[0]
    n_dev = mesh.devices.size
    k = min(int(k), MAX_K)
    fast = float(sigma) >= 3.0  # same quality escalation as sor_mask (parity)
    if passes is None:
        passes = 1 if fast else 2
    if window is None:
        window = resolve_window(k) if fast else max(512, resolve_window(k))
    if iters is None:
        iters = 7 if fast else 10
    impl = mesh_impl(mesh)
    blk = 1024 if impl == "xla" else _PALLAS_BLOCK
    blk = max(blk, _PALLAS_BLOCK)  # keep both impls block-aligned
    per = -(-n // (n_dev * blk)) * blk  # rows per shard, multiple of blk
    np_ = per * n_dev
    pos_p = jnp.pad(pos, ((0, np_ - n), (0, 0)), constant_values=PAD_POS)
    halo = min(-(-max(halo, window) // blk) * blk, per)
    real = jnp.arange(np_) < n
    spec = P(axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=P(axis),
        check_vma=False,
    )
    def local_md(block):
        idx = jax.lax.axis_index(axis)
        nd = jax.lax.axis_size(axis)
        left_edge = block[:halo]  # my lowest keys -> send to left neighbor
        right_edge = block[-halo:]  # my highest keys -> right neighbor
        # receive right neighbor's left edge (keys just above mine)
        from_right = jax.lax.ppermute(
            left_edge, axis, [(i, (i - 1) % nd) for i in range(nd)]
        )
        # receive left neighbor's right edge (keys just below mine)
        from_left = jax.lax.ppermute(
            right_edge, axis, [(i, (i + 1) % nd) for i in range(nd)]
        )
        # ring-wrap halos at the ends of the global order don't exist on a
        # single device either — scrub to the sentinel (the validity
        # representation BOTH window impls consume)
        from_left = jnp.where(idx == 0, PAD_POS, from_left)
        from_right = jnp.where(idx == nd - 1, PAD_POS, from_right)
        ext = jnp.concatenate([from_left, block, from_right], axis=0)
        if impl.startswith("pallas"):
            md = _sor_window_loop_pallas(ext, k, window, _PALLAS_BLOCK,
                                         iters=iters)
        else:
            svalid = ext[:, 0] < _D_VALID_MAX
            md = _sor_window_loop(ext, svalid, k, window, blk, True)
        return md[halo:halo + block.shape[0]]

    cmd = jnp.full(np_, jnp.inf, jnp.float32)
    for rot, shift in _PASS_ORDERS[:max(1, passes)]:
        key = _morton_key(pos_p, real, rot, shift)
        order = jnp.argsort(key)  # distributed sort under jit
        spos = jax.device_put(pos_p[order], NamedSharding(mesh, spec))
        md_sorted = local_md(spos)
        md = jnp.zeros(np_, jnp.float32).at[order].set(md_sorted)
        cmd = jnp.minimum(cmd, md)

    cnt = jnp.float32(max(n, 1))
    mean = jnp.sum(jnp.where(real, cmd, 0.0)) / cnt
    var = jnp.sum(jnp.where(real, (cmd - mean) ** 2, 0.0)) / cnt
    thresh = mean + sigma * jnp.sqrt(jnp.maximum(var, 0.0))
    return ((cmd < thresh) & real)[:n]


# -------------------------------------------------------- distributed kmeans


def mesh_impl(mesh: Mesh) -> str:
    """Resolve the kernel impl from the MESH's devices, not the default
    backend — inside ``shard_map`` traced arrays carry no ``.devices()``, so
    ``_resolve_impl(auto)`` would fall back to ``jax.default_backend()`` and
    pick the Pallas-TPU path even on a virtual CPU mesh (the round-1 bug).
    Reference analogue: automatic GPU/CPU dispatch, gpu_ops.py:33-46."""
    platform = next(iter(mesh.devices.flat)).platform
    return "pallas" if platform in ("tpu", "axon") else "xla"


_INIT_POOL_PER_SHARD = 8192


def sharded_kmeans(
    x: jax.Array,
    k: int,
    mesh: Mesh,
    max_iter: int = 10,
    seed: int = 0,
    axis: str = "data",
    n_valid: jax.Array | None = None,
    precision: str = "bf16",
):
    """K-Means over data sharded on the mesh; centroids all-reduced.

    Init is de-replicated: each shard contributes a strided subsample
    (<=8k points) to an ``all_gather``'d pool, and k-means++ runs on the
    small pool — O(pool) replicated work instead of O(N), so the full
    array is never materialized per device.

    ``n_valid``: rows at global index >= n_valid are padding — excluded
    from the init pool and routed to the update discard bin (rows must be
    padded at the END, as ops.padding.pad_rows does).

    Returns (centroids [K,D] replicated, labels [N] sharded like x).
    """
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    impl = mesh_impl(mesh)
    n_dev = mesh.devices.size
    n_local = x.shape[0] // n_dev
    sub = min(_INIT_POOL_PER_SHARD, n_local)
    stride = max(1, n_local // sub)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(None, None), P(axis)),
        check_vma=False,
    )
    def run(xb):
        grow0 = jax.lax.axis_index(axis) * n_local
        # padding is at the global END, so each shard's valid rows are a
        # prefix: local n_valid = clip(global - shard offset)
        nv_local = None if n_valid is None else jnp.clip(
            n_valid - grow0, 0, n_local)
        sample = jax.lax.slice(xb, (0, 0), (sub * stride, xb.shape[1]),
                               (stride, 1))
        pool = jax.lax.all_gather(sample, axis, axis=0, tiled=True)
        if nv_local is not None:
            svalid = jax.lax.slice(
                grow0 + jnp.arange(n_local) < n_valid, (0,),
                (sub * stride,), (stride,))
            pvalid = jax.lax.all_gather(svalid, axis, axis=0, tiled=True)
            # replace pad rows with the first valid row (duplicates are
            # harmless for k-means++: zero distance, never re-picked)
            first = jnp.argmax(pvalid)
            pool = jnp.where(pvalid[:, None], pool, pool[first][None, :])
        c0 = km.init_centroids(pool, k, jax.random.PRNGKey(seed))

        def body(c, _):
            sums, counts, _ = km.lloyd_step(
                xb, c, k, n_valid=nv_local, impl=impl, precision=precision)
            sums = jax.lax.psum(sums, axis)
            counts = jax.lax.psum(counts, axis)
            return km._centroid_means(sums, counts, c), None

        c, _ = jax.lax.scan(body, c0, None, length=max_iter)
        return c, km.assign(xb, c, impl=impl)

    return run(xs)


def sharded_kmeans_chunked(
    x: jax.Array,
    n_valid,
    num_chunks: int,
    k_per_chunk: int,
    max_iter: int,
    seed: int,
    mesh: Mesh,
    axis: str = "data",
    precision: str = "bf16",
):
    """Locality-chunked K-Means (the SOG shN palette strategy) with the
    CHUNK axis sharded over the mesh — chunks are independent fits, so this
    is embarrassingly parallel; each device runs its local chunks with the
    global chunk index keying the PRNG and label offsets, making the result
    identical to the single-device path for any device count.

    ``x`` is the padded [num_chunks*chunk, D] array (rows beyond n_valid are
    padding); num_chunks % mesh size must be 0.
    Returns (centroids [num_chunks*k, D], labels [N] global-palette-indexed).
    """
    impl = mesh_impl(mesh)
    n_dev = mesh.devices.size
    local_chunks = num_chunks // n_dev
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    def run(xb):
        off = jax.lax.axis_index(axis) * local_chunks
        return km._chunked_core(
            xb, n_valid, seed, local_chunks, k_per_chunk, max_iter, impl,
            chunk_offset=off, precision=precision,
        )

    return run(xs)


# ----------------------------------------------------------- sharded render


def sharded_render(cloud, cam, mesh: Mesh, axis: str = "data", **kw):
    """Distributed render: shards composite depth-contiguous splat chunks,
    partial (rgb, transmittance) images fold in shard order.

    cloud must be padded to n_dev (see sharding.pad_cloud); returns [H,W,3].
    """
    from ..render import rasterizer as rz
    from ..render.project import project_gaussians

    # global depth sort (sharded sort under jit)
    proj = project_gaussians(cloud.pos, cloud.log_scale, cloud.quat, cam)
    order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
    sorted_cloud = cloud.select(order)

    spec4 = P(axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            spec4, spec4, P(axis, None, None), P(axis), spec4, spec4,
        ),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    def run(pos, sh_dc, sh_rest, opacity, log_scale, quat):
        chunk = cloud.replace(
            pos=pos, sh_dc=sh_dc, sh_rest=sh_rest, opacity=opacity,
            log_scale=log_scale, quat=quat, rgb=None, extras={},
        )
        # partial render against black bg, plus transmittance image
        rgb = rz.render(chunk, cam, bg=jnp.zeros(3), **kw)
        # transmittance = render of pure-white scene against black... cheaper:
        # alpha image = 1 - T obtained by rendering unit-color splats
        white = chunk.replace(
            sh_dc=jnp.full_like(sh_dc, (1.0 - 0.5) / 0.28209479177387814),
            sh_rest=jnp.zeros_like(sh_rest),
        )
        acc = rz.render(white, cam, bg=jnp.zeros(3), sh_degree=0, **kw)
        trans = 1.0 - jnp.clip(acc[..., :1], 0.0, 1.0)
        # out = sum_i (prod_{j<i} t_j) * rgb_i.  The exclusive prefix product
        # of transmittance is computed with a log2(D)-step Hillis-Steele scan
        # over ppermutes of ONE [H,W,1] plane, then a commutative psum folds
        # the weighted partials — replaces the round-1 full [D,H,W,4]
        # all_gather (quadratic-in-devices traffic at real resolutions).
        nd = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        v = trans
        s = 1
        while s < nd:
            prev = jax.lax.ppermute(
                v, axis, [(i, (i + s) % nd) for i in range(nd)]
            )
            v = jnp.where(idx >= s, prev * v, v)
            s *= 2
        prev = jax.lax.ppermute(
            v, axis, [(i, (i + 1) % nd) for i in range(nd)]
        )
        prefix = jnp.where(idx == 0, jnp.ones_like(trans), prev)
        return jax.lax.psum(prefix * rgb, axis)

    put = lambda a: jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
    return run(
        put(sorted_cloud.pos), put(sorted_cloud.sh_dc), put(sorted_cloud.sh_rest),
        put(sorted_cloud.opacity), put(sorted_cloud.log_scale), put(sorted_cloud.quat),
    )


# ----------------------------------------- tile-sharded render (all_to_all)


def band_occupancy(cloud, cam, mesh: Mesh, axis: str = "data") -> jax.Array:
    """[n_dev, n_dev] count of splats each SOURCE shard would send to each
    destination row-band — the exact per-(src,dest) demand that
    ``sharded_render_tiles``'s fixed per-destination budget must cover.
    Row i, col j = source shard i's splats covering band j."""
    from ..render import rasterizer as rz
    from ..render.project import project_gaussians

    n_dev = mesh.devices.size
    h = cam.height
    rows_per = h // n_dev
    spec2 = P(axis, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec2, spec2, spec2),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def count(pos, log_scale, quat):
        p = project_gaussians(pos, log_scale, quat, cam)
        y0 = jnp.clip(p["means2d"][:, 1] - p["radius"], 0, h - 1)
        y1 = jnp.clip(p["means2d"][:, 1] + p["radius"], 0, h - 1)
        d0 = (y0 // rows_per).astype(jnp.int32)
        d1 = (y1 // rows_per).astype(jnp.int32)
        dests = jnp.arange(n_dev)
        covers = (
            (d0[:, None] <= dests[None, :]) & (d1[:, None] >= dests[None, :])
            & p["in_front"][:, None]
        )
        return jnp.sum(covers, axis=0, dtype=jnp.int32)[None, :]

    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
    return count(put(cloud.pos), put(cloud.log_scale), put(cloud.quat))


def sharded_render_tiles(cloud, cam, mesh: Mesh, axis: str = "data",
                         budget: int | None = None, **kw):
    """Screen-space parallel render: image row-bands sharded across chips,
    splats redistributed with ``all_to_all`` (SURVEY.md §2.4 "tiles sharded
    ... splat->tile binning with all_to_all redistribution").

    Each shard bins ITS splats by destination row-band (fixed ``budget``
    entries per destination, nearest-first in depth order), one all_to_all
    delivers every band's splats to its owner chip, which depth-sorts the
    merged set and rasterizes its rows.  cloud must be padded to n_dev.

    ``budget=None`` (default) AUTO-SIZES from the measured per-(src,dest)
    demand (``band_occupancy``), rounded to a power of two — no splat is
    ever silently dropped, at the cost of one scalar readback and one
    compile per budget bucket.  An explicit integer budget is honored
    as a hard cap; any resulting truncation is counted and reported via
    ``status_print`` (far splats drop first — nearest-first selection).
    """
    from ..render import rasterizer as rz
    from ..render.project import project_gaussians
    from ..utils.log import status_print

    n_dev = mesh.devices.size
    h, w = cam.height, cam.width
    assert h % (rz.TILE * n_dev) == 0, "image rows must split across devices"
    rows_per = h // n_dev

    proj = project_gaussians(cloud.pos, cloud.log_scale, cloud.quat, cam)
    order = jnp.argsort(jnp.where(proj["in_front"], proj["depth"], jnp.inf))
    sc = cloud.select(order)

    # demand is measured on the depth-SORTED shards (what actually sends)
    occ = band_occupancy(sc, cam, mesh, axis)
    max_need = int(jnp.max(occ))
    if budget is None:
        # pow2 bucket keeps recompiles rare; cap at the shard size (a shard
        # cannot send more than it owns)
        budget = min(max(256, 1 << max(0, (max_need - 1)).bit_length()),
                     cloud.n // n_dev)
    elif max_need > budget:
        dropped = int(jnp.sum(jnp.maximum(occ - budget, 0)))
        status_print(
            f"Warning: sharded_render_tiles budget={budget} saturated — "
            f"max band demand {max_need}; {dropped} farthest splat-sends "
            "truncated (pass budget=None to auto-size)."
        )

    spec2 = P(axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec2, spec2, P(axis, None, None), P(axis), spec2, spec2),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    def run(pos, sh_dc, sh_rest, opacity, log_scale, quat):
        nd = jax.lax.axis_size(axis)
        # project locally to find destination row-bands (full radius:
        # near-camera giants are sent to EVERY band they cover; the
        # renderer's global-candidate escape handles them within a band)
        p = project_gaussians(pos, log_scale, quat, cam)
        y0 = jnp.clip(p["means2d"][:, 1] - p["radius"], 0, h - 1)
        y1 = jnp.clip(p["means2d"][:, 1] + p["radius"], 0, h - 1)
        d0 = (y0 // rows_per).astype(jnp.int32)
        d1 = (y1 // rows_per).astype(jnp.int32)
        nloc = pos.shape[0]
        budget_c = min(budget, nloc)  # static clamp for tiny local shards

        feats = jnp.concatenate(
            [pos, sh_dc, sh_rest.reshape(nloc, -1), opacity[:, None],
             log_scale, quat, p["depth"][:, None]],
            axis=1,
        )  # [nloc, F]

        def pick(dest):
            # first `budget` local splats (depth order) covering band `dest`
            covers = (d0 <= dest) & (d1 >= dest) & p["in_front"]
            score = jnp.where(covers, -jnp.arange(nloc, dtype=jnp.float32), -jnp.inf)
            _, sel = jax.lax.top_k(score, budget_c)
            ok = jnp.take_along_axis(covers, sel, axis=0)
            f = feats[sel]
            return jnp.where(ok[:, None], f, 0.0), ok

        send_f, send_ok = jax.vmap(pick)(jnp.arange(nd))  # [nd, budget, F]
        recv_f = jax.lax.all_to_all(send_f, axis, split_axis=0, concat_axis=0, tiled=True)
        recv_ok = jax.lax.all_to_all(send_ok, axis, split_axis=0, concat_axis=0, tiled=True)
        recv_f = recv_f.reshape(-1, feats.shape[1])
        recv_ok = recv_ok.reshape(-1)

        # merge by depth across source shards
        depth = jnp.where(recv_ok, recv_f[:, -1], jnp.inf)
        morder = jnp.argsort(depth)
        f = recv_f[morder]
        ok = recv_ok[morder]

        sub = cloud.replace(
            pos=f[:, 0:3],
            sh_dc=f[:, 3:6],
            sh_rest=f[:, 6:51].reshape(-1, 3, 15),
            opacity=jnp.where(ok, f[:, 51], -30.0),
            log_scale=f[:, 52:55],
            quat=jnp.where(ok[:, None], f[:, 55:59], jnp.array([1.0, 0, 0, 0])),
            rgb=None, extras={},
        )
        # render ONLY this shard's row band: shift the principal point so the
        # band maps to rows [0, rows_per)
        import dataclasses

        my = jax.lax.axis_index(axis)
        band_cam = dataclasses.replace(
            cam, cy=cam.cy - (my * rows_per).astype(jnp.float32), height=rows_per
        )
        return rz.render(sub, band_cam, **kw)

    put = lambda a: jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
    return run(
        put(sc.pos), put(sc.sh_dc), put(sc.sh_rest),
        put(sc.opacity), put(sc.log_scale), put(sc.quat),
    )
