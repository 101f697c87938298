"""Utilities: evaluation metrics, visualization, profiling helpers."""
