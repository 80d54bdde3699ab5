"""Profiling/trace annotations: the NVTX-range equivalent for TPU.

The reference wraps its hot sections in NVTX ranges
(``NVTX_RANGE(nvtx_, "ModelInstanceExecute...")`` — reference
hps_backend/src/hps.cc:375,671-675, enabled by TRITON_ENABLE_NVTX). Here the
same structure maps onto ``jax.profiler``: annotations show up in
Perfetto/XPlane traces captured with ``start_trace``/``stop_trace``.

Usage:
    with annotate("ProcessRequest"):
        ...
    start_trace("/tmp/hps_trace")   # then view in Perfetto / TensorBoard
    stop_trace()
"""

from __future__ import annotations

import contextlib
import os

def _tracing_disabled() -> bool:
    # Read per call (cheap) so the flag works when set after import, and
    # "0"/"false" mean OFF like every other flag in the package.
    return os.environ.get("HPS_TPU_DISABLE_TRACING", "").strip().lower() in (
        "1", "true", "yes", "on")


def annotate(name: str):
    """Context manager marking a host-side region in profiler traces."""
    if _tracing_disabled():
        return contextlib.nullcontext()
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str) -> None:
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    import jax.profiler

    jax.profiler.stop_trace()
