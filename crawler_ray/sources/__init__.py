"""Corpus sources/sinks: Lance when available, Parquet fallback (SURVEY §7.1
environment note — same schema, same versioned-checkpoint semantics)."""
