"""Query registry: Spark builders + DuckDB oracle SQL pairs."""
