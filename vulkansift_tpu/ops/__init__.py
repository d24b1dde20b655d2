"""Compute kernels: scale-space, extraction, orientation, descriptors,
matching. Pure XLA implementations first; Pallas variants live alongside as
they land (see each module's docstring for the reference shader it
replaces)."""
