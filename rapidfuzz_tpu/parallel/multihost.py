"""Multi-host sharded corpus scan runner.

The reference is single-process (SURVEY.md §2.4: no threads, no
collectives anywhere in ``/root/reference/src``); the scale-out targets
come from BASELINE.md (≥85% linear scaling to 2 hosts).  This module is the
single-controller JAX entry point for that config:

* every host calls :func:`initialize` (standard ``jax.distributed`` —
  coordinator address + process count from args or env);
* the corpus is sharded host-locally and assembled into one global array
  with ``jax.make_array_from_process_local_data`` over a global
  ``("data",)`` mesh — corpus shards never cross DCN;
* queries/PM tables are replicated; per-shard scans run the same kernels
  as the single-chip path; the top-k merge is the same
  ``all_gather``-of-local-top-k collective as :func:`topk_merge`, which
  rides ICI within a host and DCN only for the k·hosts merge row.

Run (per host)::

    python -m rapidfuzz_tpu.parallel.multihost \
        --coordinator=HOST0:1234 --num-processes=2 --process-id=$ID \
        --corpus-size=1048576 --iters=20

Prints one JSON line per host; process 0's line carries the global
pairs/s.  Single-process invocation (no flags) runs the same code path on
all local devices — that mode is what CI exercises.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def initialize(coordinator: str | None, num_processes: int | None,
               process_id: int | None) -> None:
    """``jax.distributed.initialize`` wrapper; no-op when single-process."""
    import jax

    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_scan_bench(corpus_size: int = 1 << 20, length: int = 64,
                      iters: int = 20, metric: str = "levenshtein",
                      seed: int = 0) -> dict:
    """Sharded one-vs-many scan over all visible devices; returns stats.

    Each host materialises only its local corpus shard; the global array is
    assembled shard-wise, so corpora scale with total host count.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..ops import levenshtein as _lev_ops
    from .scan import _distance_fn
    from .topk import topk_merge

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    nproc = jax.process_count()
    pid = jax.process_index()

    from ..utils import codec as _codec

    per_host = -(-corpus_size // nproc)
    rng = np.random.default_rng(seed + pid)
    LB = _codec.bucket_len(length)
    local = np.full((per_host, LB), _codec.PAD, np.int32)
    local[:, :length] = rng.integers(97, 123, (per_host, length))
    local_lens = np.full(per_host, length, np.int32)

    shard = NamedSharding(mesh, P("data", None))
    shard1 = NamedSharding(mesh, P("data"))
    chars = jax.make_array_from_process_local_data(shard, local)
    lens = jax.make_array_from_process_local_data(shard1, local_lens)

    qrng = np.random.default_rng(seed)   # same query on every host
    q = qrng.integers(97, 123, length).astype(np.int32)
    qc, ql = _codec.pad_batch([q])

    fn = jax.jit(_distance_fn(metric), out_shardings=shard1)
    dist = fn(qc, ql, chars, lens)
    jax.block_until_ready(dist)

    t0 = time.perf_counter()
    for _ in range(iters):
        dist = fn(qc, ql, chars, lens)
    jax.block_until_ready(dist)
    dt = (time.perf_counter() - t0) / iters

    idx = jnp.arange(dist.shape[0], dtype=jnp.int32)
    vals, ids = topk_merge(dist.astype(jnp.float32), idx, 5, mesh,
                           largest=False)

    total = per_host * nproc
    return {
        "metric": metric,
        "pairs_per_s": total / dt,
        "pairs_per_s_per_device": total / dt / len(devs),
        "corpus": total,
        "hosts": nproc,
        "devices": len(devs),
        "ms_per_scan": dt * 1e3,
        "top1": float(np.asarray(vals)[0]),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--corpus-size", type=int, default=1 << 20)
    p.add_argument("--length", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--metric", default="levenshtein")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' — used for the "
                        "2-process CPU validation of the multi-host path)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.coordinator:
            # cross-process collectives on the CPU backend need an
            # explicit implementation (gloo ships with jaxlib)
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
    initialize(args.coordinator, args.num_processes, args.process_id)
    stats = global_scan_bench(args.corpus_size, args.length, args.iters,
                              args.metric)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
