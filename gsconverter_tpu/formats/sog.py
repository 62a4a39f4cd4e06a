"""PlayCanvas .sog codec — ZIP of lossless WebP textures + meta.json.

Container & quantization contract (reference formats/sog.py):
  - texture dims width=ceil(sqrt(N)/4)*4, height=ceil(N/width/4)*4 (sog.py:259)
  - lexsort by (z,y,x) for locality (sog.py:264)
  - positions: sign*log(|v|+1) -> min/max norm -> u16 -> lo/hi byte WebPs
  - quats: smallest-three u8x3, alpha = 252+max_idx (ops.quant.pack_rot_sog)
  - scales & sh0: 256-entry sorted scalar K-Means codebooks (fit on <=50k
    subsample), indices in RGB channels; sh0 alpha = sigmoid(opacity)*255
  - shN: chunked K-Means palette (target K by compression level: <=3 -> 64k,
    4-6 -> 16k, else 4k; floor 256; sog.py:513-521), centroid values scalar-
    quantized into a 256 codebook, 64-wide centroid index image + u16 label
    image; meta.json version 2 (sog.py:611-637).

TPU-first: all quantization and the K-Means fits run on device
(ops.kmeans MXU assign + segment-sum update); PIL only encodes/decodes the
lossless WebP containers on host.
"""

from __future__ import annotations

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import SplatCloud, degree_for_coeffs, COEFFS_FOR_DEGREE
from ..ops import quant
from ..ops.kmeans import kmeans
from ..utils.log import debug_print, status_print
from .base import BaseFormat, register

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _webp_bytes(flat_rgba: np.ndarray, w: int, h: int) -> bytes:
    img = Image.frombytes("RGBA", (w, h), flat_rgba.tobytes())
    bio = io.BytesIO()
    img.save(bio, format="WEBP", lossless=True, quality=100, method=1)
    return bio.getvalue()


def _read_webp_flat(zf: zipfile.ZipFile, name: str, expected: int) -> np.ndarray:
    with zf.open(name) as f:
        img = Image.open(f)
        if img.mode != "RGBA":
            img = img.convert("RGBA")
        data = np.array(img).reshape(-1, 4)
    if len(data) < expected:
        raise ValueError(f"Image {name} too small: {len(data)} < {expected}")
    return data[:expected]


@jax.jit
def _encode_fixed(pos, quat, opacity):
    order = jnp.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    lp = jnp.sign(pos[order]) * jnp.log(jnp.abs(pos[order]) + 1.0)
    mins = jnp.min(lp, axis=0)
    maxs = jnp.max(lp, axis=0)
    rng = jnp.where(maxs - mins > 0, maxs - mins, 1.0)
    u16 = jnp.clip((lp - mins) / rng * 65535.0, 0, 65535).astype(jnp.uint16)
    q_u8, q_alpha = quant.pack_rot_sog(quat[order])
    op_u8 = jnp.clip(jax.nn.sigmoid(opacity[order]) * 255.0, 0, 255).astype(jnp.uint8)
    return order, u16, mins, maxs, q_u8, q_alpha, op_u8


def _fit_scalar_codebook(vals: jax.Array, seed: int) -> np.ndarray:
    """256-entry sorted scalar codebook fit on a <=50k subsample
    (reference sog.py:392-407)."""
    v = vals.reshape(-1)
    if v.shape[0] > 50000:
        key = jax.random.PRNGKey(seed)
        idx = jax.random.choice(key, v.shape[0], shape=(50000,), replace=False)
        fit = v[idx]
    else:
        fit = v
    c, _ = kmeans(fit[:, None], 256, max_iter=20, seed=seed)
    return np.sort(np.asarray(c).reshape(-1))


@register
class SogFormat(BaseFormat):
    name = "sog"
    extension = ".sog"
    max_sh_degree = 3
    needs_rgb = True

    # ----------------------------------------------------------------- read
    def read(self, path: str, **kwargs) -> SplatCloud:
        if Image is None:
            raise ImportError("Pillow is required to read .sog files.")
        if not zipfile.is_zipfile(path):
            raise ValueError("SOG Format: Only ZIP-bundled .sog files are supported.")
        with zipfile.ZipFile(path, "r") as zf:
            meta = json.load(zf.open("meta.json"))
            n = meta["count"]

            ml = _read_webp_flat(zf, meta["means"]["files"][0], n)
            mu = _read_webp_flat(zf, meta["means"]["files"][1], n)
            q16 = ml[:, :3].astype(np.uint16) | (mu[:, :3].astype(np.uint16) << 8)
            mins = np.array(meta["means"]["mins"], np.float32)
            maxs = np.array(meta["means"]["maxs"], np.float32)
            logv = q16.astype(np.float32) / 65535.0 * (maxs - mins) + mins
            pos = np.sign(logv) * (np.exp(np.abs(logv)) - 1.0)

            sidx = _read_webp_flat(zf, meta["scales"]["files"][0], n)
            scb = np.array(meta["scales"]["codebook"], np.float32)
            log_scale = scb[sidx[:, :3]]

            qdata = _read_webp_flat(zf, meta["quats"]["files"][0], n)
            quat = quant.unpack_rot_sog(
                np.ascontiguousarray(qdata[:, :3]), np.ascontiguousarray(qdata[:, 3])
            )

            s0 = _read_webp_flat(zf, meta["sh0"]["files"][0], n)
            cb0 = np.array(meta["sh0"]["codebook"], np.float32)
            sh_dc = cb0[s0[:, :3]]
            opacity = quant.u8_to_logit_splat(np.ascontiguousarray(s0[:, 3]))

            sh_rest = np.zeros((n, 3, 15), np.float32)
            deg = 0
            if "shN" in meta:
                deg = int(meta["shN"]["bands"])
                palette_size = int(meta["shN"]["count"])
                coeffs = COEFFS_FOR_DEGREE[deg]
                per_color = coeffs // 3
                w_c = 64 * coeffs
                h_c = int(np.ceil(palette_size / 64))
                craw = _read_webp_flat(zf, meta["shN"]["files"][0], w_c * h_c)
                # Image layout (reference sog.py:190-202): palette entry i at
                # row i//64, cols (i%64)*per_color + j; RGB channels hold the
                # per-channel codebook indices.  Vectorized gather.
                i = np.arange(palette_size)
                pix = (i // 64)[:, None] * w_c + ((i % 64) * per_color)[:, None] \
                    + np.arange(per_color)[None, :]
                pal_idx = craw[pix.reshape(-1), :3].reshape(palette_size, per_color, 3)
                cbN = np.array(meta["shN"]["codebook"], np.float32)
                palette = cbN[pal_idx]  # [P, per_color, 3]
                palette = palette.transpose(0, 2, 1).reshape(palette_size, coeffs)

                lraw = _read_webp_flat(zf, meta["shN"]["files"][1], n)
                labels = lraw[:, 0].astype(np.uint16) | (lraw[:, 1].astype(np.uint16) << 8)
                flat = palette[labels]  # [N, coeffs] channel-major
                sh_rest = SplatCloud.sh_rest_from_flat(flat.astype(np.float32))

        # host-resident cloud (utils/transfer.py residency policy)
        return SplatCloud(
            pos=pos.astype(np.float32), sh_dc=sh_dc.astype(np.float32),
            sh_rest=sh_rest, opacity=opacity.astype(np.float32),
            log_scale=log_scale.astype(np.float32), quat=quat.astype(np.float32),
            normal=np.zeros((n, 3), np.float32),
            active_sh_degree=deg,
        )

    # ---------------------------------------------------------------- write
    def write(self, cloud: SplatCloud, path: str, **kwargs) -> None:
        if Image is None:
            raise ImportError("Pillow is required to write .sog files.")
        from ..ops.sh import detect_active_degree

        n = cloud.n
        width = int(np.ceil(np.sqrt(n) / 4) * 4)
        height = int(np.ceil(n / width / 4) * 4)
        npix = width * height

        order, u16, mins, maxs, q_u8, q_alpha, op_u8 = _encode_fixed(
            cloud.pos, cloud.quat, cloud.opacity
        )
        order_np = np.asarray(order)
        u16 = np.asarray(u16)

        zf = zipfile.ZipFile(path, "w", zipfile.ZIP_STORED)

        def write_img(name, rgba, w=width, h=height):
            zf.writestr(name, _webp_bytes(rgba, w, h))

        means_l = np.full((npix, 4), 255, np.uint8)
        means_u = np.full((npix, 4), 255, np.uint8)
        means_l[:n, :3] = (u16 & 0xFF).astype(np.uint8)
        means_u[:n, :3] = (u16 >> 8).astype(np.uint8)
        write_img("means_l.webp", means_l)
        write_img("means_u.webp", means_u)

        quats = np.full((npix, 4), 255, np.uint8)
        quats[:n, :3] = np.asarray(q_u8)
        quats[:n, 3] = np.asarray(q_alpha)
        write_img("quats.webp", quats)

        status_print("Clustering Scales...")
        scl_sorted = np.asarray(cloud.log_scale)[order_np]
        scale_cb = _fit_scalar_codebook(jnp.asarray(scl_sorted), seed=1)
        scl_idx = np.asarray(
            quant.nearest_codebook_index(jnp.asarray(scl_sorted), jnp.asarray(scale_cb))
        )
        scales_img = np.zeros((npix, 4), np.uint8)
        scales_img[:n, :3] = scl_idx.astype(np.uint8)
        scales_img[:n, 3] = 255
        write_img("scales.webp", scales_img)

        status_print("Clustering Colors...")
        dc_sorted = np.asarray(cloud.sh_dc)[order_np]
        color_cb = _fit_scalar_codebook(jnp.asarray(dc_sorted), seed=2)
        dc_idx = np.asarray(
            quant.nearest_codebook_index(jnp.asarray(dc_sorted), jnp.asarray(color_cb))
        )
        sh0_img = np.zeros((npix, 4), np.uint8)
        sh0_img[:n, :3] = dc_idx.astype(np.uint8)
        sh0_img[:n, 3] = np.asarray(op_u8)
        write_img("sh0.webp", sh0_img)

        shN_meta = None
        sh_bands = detect_active_degree(cloud)
        if sh_bands > 0:
            coeffs = COEFFS_FOR_DEGREE[sh_bands]
            per_color = coeffs // 3
            sh_flat = np.asarray(cloud.sh_rest_flat())[order_np][:, :coeffs]

            comp_level = int(kwargs.get("compression_level", 0) or 0)
            status_print(f"SOG Write Quality Level: {comp_level} (0=Max, 9=Min)")
            official_k = min(64, 2 ** int(np.floor(np.log2(max(n, 1024) / 1024)))) * 1024
            if comp_level <= 3:
                target_k = min(65536, official_k)
            elif comp_level <= 6:
                target_k = min(16384, official_k)
            else:
                target_k = min(4096, official_k)
            target_k = max(256, target_k)

            num_chunks = max(1, min(64, n // 1024))
            k_per_chunk = max(16, int(np.ceil(target_k / num_chunks)))
            # cap so palette labels stay u16
            k_per_chunk = min(k_per_chunk, 65536 // num_chunks)
            status_print(
                f"SH Clustering: K={target_k}, Points={n}, chunks={num_chunks} "
                "(single-jit batched MXU K-Means)"
            )
            from ..ops.kmeans import kmeans_chunked

            c, l = kmeans_chunked(
                jnp.asarray(sh_flat), num_chunks, k_per_chunk, max_iter=10, seed=100
            )
            centroids = np.asarray(c)
            labels = np.asarray(l)
            palette_size = len(centroids)

            status_print("Clustering SH Centroids into Codebook...")
            cbN = _fit_scalar_codebook(jnp.asarray(centroids.reshape(-1)), seed=3)
            cent_idx = np.asarray(
                quant.nearest_codebook_index(
                    jnp.asarray(centroids.reshape(-1)), jnp.asarray(cbN)
                )
            ).astype(np.uint8)

            # Pack centroid-index image: [P, coeffs] channel-major ->
            # [P, per_color, 3] pixels laid out 64 palettes per row.
            w_c = 64 * coeffs
            h_c = int(np.ceil(palette_size / 64))
            cent_img = np.full((w_c * h_c, 4), 255, np.uint8)
            per_pal = cent_idx.reshape(palette_size, 3, per_color).transpose(0, 2, 1)
            i = np.arange(palette_size)
            pix = (i // 64)[:, None] * w_c + ((i % 64) * per_color)[:, None] \
                + np.arange(per_color)[None, :]
            cent_img[pix.reshape(-1), :3] = per_pal.reshape(-1, 3)
            write_img("shN_centroids.webp", cent_img, w_c, h_c)

            labels_img = np.zeros((npix, 4), np.uint8)
            lab16 = labels.astype(np.uint16)
            labels_img[:n, 0] = (lab16 & 0xFF).astype(np.uint8)
            labels_img[:n, 1] = (lab16 >> 8).astype(np.uint8)
            labels_img[:n, 3] = 255
            write_img("shN_labels.webp", labels_img)

            shN_meta = {
                "count": int(palette_size),
                "bands": int(sh_bands),
                "codebook": [float(x) for x in cbN],
                "files": ["shN_centroids.webp", "shN_labels.webp"],
            }

        meta = {
            "version": 2,
            "asset": {"generator": "gsconverter-tpu-sog"},
            "count": n,
            "means": {
                "mins": [float(x) for x in np.asarray(mins)],
                "maxs": [float(x) for x in np.asarray(maxs)],
                "files": ["means_l.webp", "means_u.webp"],
            },
            "scales": {
                "codebook": [float(x) for x in scale_cb],
                "files": ["scales.webp"],
            },
            "quats": {"files": ["quats.webp"]},
            "sh0": {
                "codebook": [float(x) for x in color_cb],
                "files": ["sh0.webp"],
            },
        }
        if shN_meta:
            meta["shN"] = shN_meta
        zf.writestr("meta.json", json.dumps(meta))
        zf.close()
        status_print(f"SOG write completed to {path}. {n} points bundled.")
