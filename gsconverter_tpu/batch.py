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

    jobs = [
        (src, fmt) for src in inputs for fmt in target_formats
    ]
    done = []
    for i, (src, fmt) in enumerate(jobs):
        if i % process_count != process_index:
            continue
        base = os.path.splitext(os.path.basename(src))[0]
        out = os.path.join(out_dir, f"{base}_{fmt}{EXT_MAP[fmt]}")
        status_print(f"[batch {i + 1}/{len(jobs)}] {src} -> {out}")
        Converter(src, out, fmt).run(**kwargs)
        done.append((src, fmt, out))
    return done
