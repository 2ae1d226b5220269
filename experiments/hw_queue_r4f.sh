#!/bin/sh
# Round-4 follow-up hardware queue (part 6): smoke the damerau default
# routes after the MAX_TEXT_LONG 8192 extension (incl. the new
# damerau_long8k route).  Serial, ping-gated — tunnel discipline per
# experiments/README.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4f.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue start"
wait_alive
log "smoke damerau routes start"
timeout 3600 python -u tools/hw_smoke.py --timeout 600 \
  --routes damerau_seq,damerau_long,damerau_long8k \
  --out "$EV/hw_smoke_r4_dam8k.log" >> "$EV/hw_smoke_r4_dam8k_stdout.log" 2>&1
log "smoke rc=$?"
log "queue done"
