"""Data sources: synthetic corpus generator and the table catalog."""
