"""Profiling hooks (SURVEY §5: the reference has none; the TPU build adds
jax profiler integration).

    from mvedit_tpu.utils.profiling import trace, annotate

    with trace("/tmp/jax_trace"):        # xplane proto -> tensorboard /
        pipe(targets, key, pos, neg)     # xprof

    with annotate("mesh_fit"):           # named region in the trace
        fit(...)

`bench.py --profile DIR` wraps the headline step in a trace.
"""
from contextlib import contextmanager

__all__ = ["trace", "annotate"]


@contextmanager
def trace(log_dir="/tmp/jax_trace", host_tracer_level=2):
    """Capture a device+host profile viewable in TensorBoard/xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name):
    """Named region (TraceAnnotation) inside an active trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
