"""Tracing / profiling utilities.

The reference's observability is print-based per-stage wall-clock timing
(SURVEY.md §5.1: pcl2npy/t_recast/t_export/t_mesh/t_pubros prints,
/root/reference/scripts/taichislam_node.py:405). This module keeps that
print contract and adds:

- ``StageTimer``: named stage timing with EMA smoothing and the reference's
  one-line per-frame report;
- ``trace(name)``: a context manager that opens a ``jax.profiler``
  TraceAnnotation (shows up in TensorBoard/XProf captures) around host
  stages;
- ``device_trace(path)``: whole-program device profile capture via
  ``jax.profiler.start_trace``/``stop_trace``.

NOTE (this sandbox): timings of device work are only meaningful when closed
by a host readback — ``jax.block_until_ready`` does not synchronize through
the axon relay. ``StageTimer.stop(..., sync=x)`` forces one.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.ema: Dict[str, float] = {}
        self.last: Dict[str, float] = {}
        self._t0: Dict[str, float] = {}

    def start(self, name: str):
        self._t0[name] = time.perf_counter()
        return self

    def stop(self, name: str, sync=None) -> float:
        """Stop a stage; ``sync`` (a jax array) forces a device readback so
        the measurement includes device execution."""
        if sync is not None:
            try:
                import jax.numpy as jnp
                float(jnp.sum(sync.astype(jnp.float32)))
            except Exception:
                pass
        ms = (time.perf_counter() - self._t0.pop(name)) * 1000.0
        self.last[name] = ms
        self.ema[name] = ms if name not in self.ema else \
            (1 - self.alpha) * self.ema[name] + self.alpha * ms
        return ms

    @contextlib.contextmanager
    def stage(self, name: str, sync_fn=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, sync=sync_fn() if sync_fn else None)

    def report(self, prefix: str = "[TaichiSLAM]") -> str:
        """The reference's per-frame timing line format."""
        parts = " ".join(f"{k} {v:.1f}ms" for k, v in self.last.items())
        return f"{prefix} Time: {parts}"


@contextlib.contextmanager
def trace(name: str):
    """jax.profiler trace annotation around a host-side stage."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a full device profile (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
