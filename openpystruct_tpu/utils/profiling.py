"""Profiling helpers around jax.profiler.

The reference has no profiler hooks at all (SURVEY.md section 5); this adds
the standard JAX trace context for inspecting programs in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a device+host trace into ``log_dir``::

        with profile_trace("/tmp/trace"):
            train_step(...)  # traced

    View with TensorBoard's profile plugin or xprof.
    """
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
