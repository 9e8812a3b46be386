"""Compute kernels: sections, waves, Morison, beams, assembly, solvers."""
