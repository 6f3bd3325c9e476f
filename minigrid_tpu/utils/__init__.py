"""Utilities: ASCII rendering, state hashing, checkpointing."""
