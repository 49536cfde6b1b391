"""Placeholder for the ufrcnn model family (built in a later milestone)."""
