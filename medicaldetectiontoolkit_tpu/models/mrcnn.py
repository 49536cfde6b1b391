"""Placeholder for the mrcnn model family (built in a later milestone)."""
