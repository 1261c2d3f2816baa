"""Scalar-function layer: deterministic hashing and expression helpers shared
by the pipeline operators (dedup / similarity / text analysis) and their
DuckDB oracle SQL generators."""
