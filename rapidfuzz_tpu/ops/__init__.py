"""Compute kernels (XLA/jnp reference path + Pallas hot paths)."""
