"""Data-pipeline queries (dedup/similarity/text) (filled incrementally)."""
