"""Expression/predicate/clause surface queries (filled incrementally)."""
