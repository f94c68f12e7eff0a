"""Structured stage timing (the reference's CTS:L<level>:S<step> spans).

The reference wraps every pipeline stage in ``linetimer.CodeTimer`` blocks
whose labels double as its telemetry vocabulary
(`BabelIntegrationBASE.py:997-1030`, SURVEY.md section 5). This module keeps
the same label convention so downstream log scrapers keep working, and adds
an in-process registry for programmatic access.
"""

from __future__ import annotations

import contextlib
import time

_SPANS: list[tuple[str, float]] = []


@contextlib.contextmanager
def stage_timer(label: str, level: int = 2, step: int | None = None, quiet=False):
    """Context manager emitting ``CTS:L<level>:S<step>: <label>`` timing."""
    tag = f"CTS:L{level}" + (f":S{step}" if step is not None else "") + f": {label}"
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _SPANS.append((tag, dt))
        if not quiet:
            print(f"{tag} took {dt:.3f} s")
        try:
            from .telemetry import get_telemetry

            get_telemetry().event(tag, duration_s=dt)
        except Exception:
            pass  # telemetry must never break the pipeline


def recorded_spans():
    return list(_SPANS)


def clear_spans():
    _SPANS.clear()
