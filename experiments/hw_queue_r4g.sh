#!/bin/sh
# Round-4 follow-up hardware queue (part 7): full-corpus conformance for
# the new 4096-8192 long-Damerau region.  Serial, ping-gated — tunnel
# discipline per experiments/README.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4g.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue start"
wait_alive
log "conformance damerau_long8k start"
timeout 3600 python -u tools/hw_conformance.py --checks damerau_long8k \
  --out "$EV/hw_conformance_dam8k_r4.log" \
  >> "$EV/hw_conformance_dam8k_r4_stdout.log" 2>&1
log "conformance rc=$?"
log "queue done"
