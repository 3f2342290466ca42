"""Pluggable sources (Spark 4 Python Data Source API)."""
