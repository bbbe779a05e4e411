"""Utilities: metrics, analysis harness, config, logging, profiling."""
