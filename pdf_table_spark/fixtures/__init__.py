"""Deterministic synthetic interleaved-document corpus + golden builder."""
