"""Subpackage: kernels."""
