"""Profiling / tracing hooks.

The reference's observability is wall-clock prints around the two passes
(SURVEY §5). TPU equivalent: ``jax.profiler`` trace annotations per phase
plus a phase timer that synchronizes correctly on relay-style backends
(where only a device_get round-trip truly waits).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp

_PHASES: dict[str, float] = {}


def sync() -> None:
    """True device sync: fetch a scalar (block_until_ready may be async on
    relayed backends)."""
    jax.device_get(jnp.zeros(()))


@contextlib.contextmanager
def phase(name: str, annotate: bool = True, do_sync: bool = True) -> Iterator[None]:
    """Time a phase (optionally under a jax.profiler TraceAnnotation)."""
    if do_sync:
        sync()
    t0 = time.perf_counter()
    cm = (
        jax.profiler.TraceAnnotation(name)
        if annotate
        else contextlib.nullcontext()
    )
    with cm:
        yield
    if do_sync:
        sync()
    _PHASES[name] = _PHASES.get(name, 0.0) + (time.perf_counter() - t0)


def phase_report(reset: bool = True) -> dict[str, float]:
    out = dict(_PHASES)
    if reset:
        _PHASES.clear()
    return out


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a full device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
