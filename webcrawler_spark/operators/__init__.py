"""Reusable distributed operators (seen-filter, dedup, similarity, text stats)."""
