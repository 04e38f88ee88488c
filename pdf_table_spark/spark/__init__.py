"""Distributed pipeline: DataFrame ops + Arrow stages, no per-row UDFs."""
