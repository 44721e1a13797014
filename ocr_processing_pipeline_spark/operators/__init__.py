"""Generic large-scale operators: dedup, similarity, text analysis, as-of."""
