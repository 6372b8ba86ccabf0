"""Metrics, logging, profiling."""
