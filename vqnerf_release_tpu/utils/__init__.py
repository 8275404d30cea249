"""Utilities: checkpointing, visualization writers, logging."""
