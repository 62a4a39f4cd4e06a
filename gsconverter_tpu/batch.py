"""Multi-scene batch conversion (BASELINE config 5: "100M-splat multi-scene
batch ... full N-to-N format matrix").

The reference converts one file per invocation; this drives many scenes
through the jit-cached pipeline — every scene after the first reuses the
compiled kernels (shape bucketing, ops/padding.py).  Multi-host: scenes are
round-robin assigned to processes.
"""

from __future__ import annotations

import glob as globlib
import os

from .converter import Converter, EXT_MAP, VALID_FORMATS
from .utils.log import status_print


def convert_batch(
    inputs: list[str] | str,
    out_dir: str,
    target_formats: list[str] | str,
    process_index: int = 0,
    process_count: int = 1,
    **kwargs,
) -> list[tuple[str, str, str]]:
    """Convert every input to every target format (the N-to-N matrix).

    ``inputs`` may be a glob pattern.  Returns (input, format, output) for
    the conversions THIS process performed (round-robin over processes).
    """
    if isinstance(inputs, str):
        inputs = sorted(globlib.glob(inputs))
    if isinstance(target_formats, str):
        target_formats = [target_formats]
    for fmt in target_formats:
        if fmt not in VALID_FORMATS:
            raise ValueError(f"Unknown target format '{fmt}'")
    os.makedirs(out_dir, exist_ok=True)

    # One read + filter chain per scene, N format writes: order formats so
    # the one with the LOOSEST SH cap runs the full pipeline (its processed
    # cloud carries the most SH content), then the remaining formats reuse
    # it via write_processed — each applies its own tighter cap at write
    # time, which commutes with the filters (they only read pos/opacity),
    # so every output is byte-identical to a standalone run.
    from .converter import FORMAT_MAX_SH

    fmts = sorted(target_formats, key=lambda f: -FORMAT_MAX_SH.get(f, 3))
    n_jobs = len(inputs) * len(fmts)
    done = []
    # Distribution unit: whole SCENES (the unit of shared read+filter work)
    # when there are at least as many scenes as processes; otherwise fall
    # back to per-(scene, format) jobs so every process stays busy (each
    # process then runs the full pipeline once for its first format of a
    # scene — subset order preserves loosest-SH-cap-first, so outputs stay
    # byte-identical to standalone runs).
    scene_rr = len(inputs) >= process_count
    for si, src in enumerate(inputs):
        if scene_rr and si % process_count != process_index:
            continue
        base = os.path.splitext(os.path.basename(src))[0]
        shared_cloud = None
        shared_handler = None
        for fi, fmt in enumerate(fmts):
            if (not scene_rr
                    and (si * len(fmts) + fi) % process_count != process_index):
                continue
            out = os.path.join(out_dir, f"{base}_{fmt}{EXT_MAP[fmt]}")
            status_print(
                f"[batch {si * len(fmts) + fi + 1}/{n_jobs}] {src} -> {out}"
            )
            conv = Converter(src, out, fmt)
            if shared_cloud is None:
                conv.run(**kwargs)
                shared_cloud = conv.processed_cloud
                shared_handler = conv.source_handler
            else:
                conv.write_processed(shared_cloud,
                                     source_handler=shared_handler, **kwargs)
            done.append((src, fmt, out))
    return done
