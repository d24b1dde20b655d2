"""Utility modules: logging, image IO."""
