"""Slow NumPy golden-model SIFT used as the test oracle (SURVEY.md §4)."""
