"""Importing the package must not initialize the XLA backend.

``jax.distributed.initialize`` must run before any backend-touching
call; a module-level ``jnp.int32(...)`` constant once created a device
array at import time and broke multi-process init for anyone who
imported the library first (fixed: plain numpy scalars)."""

import os
import subprocess
import sys


def test_import_does_not_initialize_backend():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import jax\n"
        "import rapidfuzz_tpu\n"
        "import rapidfuzz_tpu.parallel.scan\n"
        "import rapidfuzz_tpu.fuzz\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not xb._backends, sorted(xb._backends)\n"
        "print('pure')\n")
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=240)
    assert p.returncode == 0 and "pure" in p.stdout, p.stderr[-800:]
