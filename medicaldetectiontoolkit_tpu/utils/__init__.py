"""Experiment infrastructure: logging, snapshotting, checkpoints, monitoring."""
