"""jax.profiler tracing integration (SURVEY §5 — the TPU-native
equivalent of the reference's per-op CPU tracing hooks).

``AR_TRACE_DIR=/path`` captures an XLA/TPU profile of the tuning run
(one trace covering the block loop) viewable in TensorBoard /
xprof; each block is annotated as a profiler step so the timeline
groups per-block work (reference role: its ``must_use_cache``/timing
instrumentation around the block loop, ``compressors/base.py``).

Usage (the orchestrator does this automatically when the env is set)::

    with maybe_trace():                     # no-op unless AR_TRACE_DIR
        for bi, block in enumerate(blocks):
            with block_step(bi):
                ...
"""

from __future__ import annotations

import contextlib

import jax

from .logger import logger


@contextlib.contextmanager
def maybe_trace(trace_dir=None):
    """Context manager: jax.profiler.trace(AR_TRACE_DIR) when configured,
    else a no-op.  Never lets profiler failures break the run."""
    from .. import envs
    trace_dir = trace_dir or envs.AR_TRACE_DIR
    if not trace_dir:
        yield False
        return
    try:
        jax.profiler.start_trace(trace_dir)
        started = True
        logger.info("profiler trace -> %s", trace_dir)
    except Exception as e:  # pragma: no cover - device-dependent
        logger.warning("profiler trace failed to start: %s", e)
        started = False
    try:
        yield started
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", trace_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop_trace failed: %s", e)


def block_step(block_idx: int):
    """StepTraceAnnotation for one block — groups the block's compiles and
    device work under a named step in the trace viewer."""
    return jax.profiler.StepTraceAnnotation("block", step_num=block_idx)
