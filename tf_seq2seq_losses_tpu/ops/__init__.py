"""Lattice recursions, token scatter, custom-VJP wiring and Pallas kernels."""
