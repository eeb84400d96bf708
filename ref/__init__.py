"""Scalar numpy CPU reference renderer (the golden oracle — SURVEY.md §2c)."""
