#!/bin/bash
# Round-2 session-4 perf probes: dispatch amortization levers.
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
cd /root/repo
echo "=== lev B=32M ==="
BENCH_B=33554432 timeout 570 python -u bench.py --phase lev
echo "=== nq=16 B=16M ==="
BENCH_NQ=16 timeout 570 python -u bench.py --phase nq
echo "=== nq=16 B=8M ==="
BENCH_NQ=16 BENCH_B=8388608 timeout 570 python -u bench.py --phase nq
echo "=== done ==="
