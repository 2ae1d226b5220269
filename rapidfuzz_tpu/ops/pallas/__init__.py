"""Pallas TPU hot-path kernels with platform detection."""

from __future__ import annotations

import functools

import jax


@functools.cache
def tpu_backend() -> bool:
    """True when the default backend is a real TPU (incl. axon tunnel)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    plat = getattr(dev, "platform", "")
    return plat not in ("cpu", "gpu", "rocm")
