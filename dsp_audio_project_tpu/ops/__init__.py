"""Compute ops composing kernels with reference semantics."""
