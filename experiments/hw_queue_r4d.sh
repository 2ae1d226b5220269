#!/bin/bash
# Round-4 queue, part 4: i16 op capability matrix at the REPRESENTATIVE
# (16,128) tile shape (the first run's (8,128,2) shape put only 2
# elements on the lane axis — its failures may be layout artifacts).
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4d.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "waiting for hw_queue_r4c"
until grep -q "queue done" "$EV/hw_queue_r4c.log" 2>/dev/null; do sleep 60; done
log "r4c done; starting i16 ops probe (16,128)"
wait_alive
timeout 1200 python -u experiments/i16_ops_probe.py 16,128 \
  > "$EV/i16_ops_probe_16x128_r4.log" 2>&1
log "i16 probe 16x128 rc=$?"
log "queue done"
