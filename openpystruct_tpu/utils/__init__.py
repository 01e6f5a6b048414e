"""Observability utilities: metrics, logging, profiling."""

from openpystruct_tpu.utils.metrics import MetricsLogger, Timer, steps_per_sec
from openpystruct_tpu.utils.profiling import profile_trace

__all__ = ["MetricsLogger", "Timer", "steps_per_sec", "profile_trace"]
