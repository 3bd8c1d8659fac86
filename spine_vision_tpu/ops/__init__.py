"""Jitted device kernels: losses, image ops, geometry, fused crops."""
