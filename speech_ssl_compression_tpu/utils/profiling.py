"""Tracing / profiling (SURVEY.md §5: the reference has none — tqdm bars
only). TPU-native: jax.profiler trace server + annotated step decorator.

Usage:
    from speech_ssl_compression_tpu.utils.profiling import (
        start_server, trace, annotate)

    start_server(9999)                # connect TensorBoard's profiler to it
    with trace("/tmp/jax-trace"):     # or dump a trace directly
        run_steps()
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


_server = None


def start_server(port: int = 9999):
    """Start the profiler server once (idempotent)."""
    global _server
    if _server is None:
        _server = jax.profiler.start_server(port)
    return _server


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function."""

    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        inner.__name__ = getattr(fn, "__name__", name)
        return inner

    return wrap

