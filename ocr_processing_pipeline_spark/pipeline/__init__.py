"""Spark pipeline stages wiring the pure oracle semantics into Arrow UDFs."""
