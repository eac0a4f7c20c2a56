"""Shared utilities: logging, debug tracing, profiling."""
