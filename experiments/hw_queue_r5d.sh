#!/bin/bash
# Round-5 hardware queue, step 4: single-dispatch seq/band wrappers,
# 16M indelband / 16M partial, jaro 16384 stream, cold-start catalog.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step4 start"
wait_alive
log "conformance jaro_long16k"
timeout 3600 python -u tools/hw_conformance.py --timeout 1800 \
  --checks jaro_long16k \
  --out "$EV/hw_conformance_r5_jaro16k.log" \
  >> "$EV/hw_conformance_r5_jaro16k_stdout.log" 2>&1
log "jaro16k rc=$?"
wait_alive
log "bench phase damband (single-dispatch)"
timeout 900 python -u bench.py --phase damband \
  > "$EV/bench_r5_damband3.log" 2>&1
log "damband3 rc=$?"
wait_alive
log "bench phase damerau (single-dispatch)"
timeout 900 python -u bench.py --phase damerau \
  > "$EV/bench_r5_damerau3.log" 2>&1
log "damerau3 rc=$?"
wait_alive
log "bench phase indelband (16M, 256k chunks)"
timeout 900 python -u bench.py --phase indelband \
  > "$EV/bench_r5_indelband3.log" 2>&1
log "indelband3 rc=$?"
wait_alive
log "bench phase partial (16M)"
timeout 900 python -u bench.py --phase partial \
  > "$EV/bench_r5_partial3.log" 2>&1
log "partial3 rc=$?"
wait_alive
log "cold-start catalog"
timeout 7200 python -u experiments/cold_start_catalog.py \
  > "$EV/cold_start_catalog_r5.log" 2>&1
log "catalog rc=$?"
log "queue r5 step4 done"
