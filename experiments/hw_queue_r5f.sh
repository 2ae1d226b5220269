#!/bin/bash
# Round-5 hardware queue, step 6: 16384 jaro bucket through the scanner
# (stream route for moderate queries + XLA fallback for the 9000-char
# query), then a FULL end-to-end official-style bench run.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step6 start"
wait_alive
log "conformance jaro_long16k (stream + fallback)"
timeout 3600 python -u tools/hw_conformance.py --timeout 1800 \
  --checks jaro_long16k \
  --out "$EV/hw_conformance_r5_jaro16k2.log" \
  >> "$EV/hw_conformance_r5_jaro16k2_stdout.log" 2>&1
log "jaro16k2 rc=$?"
wait_alive
log "full bench run1"
timeout 2000 python -u bench.py > "$EV/bench_r5_run1.json" \
  2> "$EV/bench_r5_run1.log"
log "bench run1 rc=$?"
log "queue r5 step6 done"
