"""Round-pipeline stages: fetch lookup join, candidate filtering, dedup
routing, quota/priority frontier selection."""
