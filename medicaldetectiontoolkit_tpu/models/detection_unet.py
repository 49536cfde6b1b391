"""Placeholder for the detection_unet model family (built in a later milestone)."""
