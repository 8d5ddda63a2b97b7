"""Deterministic synthetic sources (seed-free, id-derived) + IO seams."""
