"""Stateless per-batch transforms (map_batches functions)."""
