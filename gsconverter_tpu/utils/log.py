"""Logging / progress utilities.

Reproduces the user-facing reporting contract of the reference
(/root/reference/gsconverter/utils/utility_functions.py:15-29): a gated
``debug_print`` and an always-on, tqdm-safe ``status_print``, plus structured
per-stage timing that the reference lacks (SURVEY.md §5 obligation).
"""

from __future__ import annotations

import contextlib
import time

from .. import config


def debug_print(msg: str) -> None:
    """Print only when debug mode is on (mirrors reference debug_print)."""
    if config.DEBUG:
        _safe_write(msg)


def status_print(msg: str) -> None:
    """Always print, routed through tqdm.write when tqdm is active."""
    _safe_write(msg)


def _safe_write(msg: str) -> None:
    try:
        from tqdm import tqdm

        tqdm.write(str(msg))
    except Exception:
        print(msg)


class StageTimer:
    """Per-stage wall-clock timing + throughput reporting.

    New capability vs the reference (which only had tqdm milestones); gives
    the Msplats/s counters that BASELINE.md defines as the headline metric.
    """

    def __init__(self) -> None:
        self.records: list[tuple[str, float, int | None]] = []

    @contextlib.contextmanager
    def stage(self, name: str, n_items: int | None = None):
        t0 = time.perf_counter()
        ctx = contextlib.nullcontext()
        try:
            import jax

            ctx = jax.profiler.TraceAnnotation(f"gsconverter/{name}")
        except Exception:
            pass
        try:
            with ctx:
                yield
        finally:
            dt = time.perf_counter() - t0
            self.records.append((name, dt, n_items))
            if config.TIMING:
                rate = f" ({n_items / dt / 1e6:.2f} Msplats/s)" if n_items else ""
                status_print(f"[timing] {name}: {dt * 1e3:.1f} ms{rate}")

    def report(self) -> dict[str, float]:
        return {name: dt for name, dt, _ in self.records}
