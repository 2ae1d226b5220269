"""Cold-start catalog: per-route compile/warmup times, cold vs warm cache.

The reference's contract is that a library call never compiles; on TPU
the first dispatch of each route pays an XLA+Mosaic compile that the
axon remote-compile tunnel can inflate to minutes (a first
jaro_winkler scan was observed at 505 s, evidence/hw_conformance_r4.log).
This probe measures what a production operator actually experiences:
``ScanService.warmup(full=True)`` route times with

* a FRESH local compilation-cache directory ("cold" — note the axon
  server keeps its own remote Mosaic cache, so a cold local cache on a
  warm server is the realistic restart case), and
* the shared persistent cache ("warm" — the serve.py default wiring).

Each configuration runs in its own subprocess (jax caches are
process-global).  Run on the TPU:

    python experiments/cold_start_catalog.py
"""

import json
import os
import subprocess
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("levenshtein", 32, 4096),
    ("jaro_winkler", 32, 4096),
    ("damerau_levenshtein", 32, 4096),
]


def _child():
    metric = sys.argv[2]
    maxlen = int(sys.argv[3])
    n = int(sys.argv[4])
    sys.path.insert(0, _ROOT)
    import numpy as np

    from rapidfuzz_tpu.serve import ScanService

    rng = np.random.default_rng(3)
    corpus = ["".join(chr(97 + int(c))
                      for c in rng.integers(0, 26, rng.integers(1, maxlen)))
              for _ in range(n)]
    svc = ScanService(corpus, metric=metric)
    table = svc.warmup(full=True)
    print(json.dumps(table), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child()
        return
    warm_dir = os.path.join(_ROOT, ".jax_cache")
    for metric, maxlen, n in CONFIGS:
        for label, cache in (("cold", None), ("warm", warm_dir)):
            env = dict(os.environ)
            tmp = None
            if cache is None:
                tmp = tempfile.mkdtemp(prefix="rf_coldcache_")
                env["JAX_COMPILATION_CACHE_DIR"] = tmp
            else:
                env["JAX_COMPILATION_CACHE_DIR"] = cache
            env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
            env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
            p = subprocess.run(
                [sys.executable, "-u", __file__, "--child", metric,
                 str(maxlen), str(n)],
                env=env, capture_output=True, text=True, timeout=2400)
            line = ""
            for ln in reversed(p.stdout.splitlines()):
                if ln.startswith("{"):
                    line = ln
                    break
            print(json.dumps({"metric": metric, "cache": label,
                              "routes": json.loads(line) if line else None,
                              "rc": p.returncode,
                              "err": p.stderr[-300:] if not line else ""}),
                  flush=True)


if __name__ == "__main__":
    main()
