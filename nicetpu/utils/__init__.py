"""Observability utilities: stage timers and profiler traces (SURVEY §5)."""
