"""Pure-NumPy golden SIFT oracle for testing (see reference.py)."""

from . import reference  # noqa: F401
