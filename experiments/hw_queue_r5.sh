#!/bin/bash
# Round-5 hardware queue, step 1 (verdict item 8): run the FULL conformance
# check matrix + the full smoke route-set as the round's FIRST hardware act,
# before any kernel work lands.  Serial, ping-gated (tunnel flaps).
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step1 start"
wait_alive
log "conformance full-matrix start"
timeout 14400 python -u tools/hw_conformance.py --timeout 1200 \
  --out "$EV/hw_conformance_r5_initial.log" \
  >> "$EV/hw_conformance_r5_initial_stdout.log" 2>&1
log "conformance rc=$?"
wait_alive
log "smoke start"
timeout 14400 python -u tools/hw_smoke.py --timeout 420 \
  --out "$EV/hw_smoke_r5_initial.log" \
  >> "$EV/hw_smoke_r5_initial_stdout.log" 2>&1
log "smoke rc=$?"
log "queue r5 step1 done"
