"""Operator-coverage queries (filled incrementally)."""
