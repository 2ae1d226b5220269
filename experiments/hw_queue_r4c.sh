#!/bin/bash
# Round-4 queue, part 3: after hw_queue_r4b.sh finishes, hardware-validate
# the shipped int16 sequential-pair Damerau bodies (ROADMAP lead 1).
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4c.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "waiting for hw_queue_r4b"
until grep -q "queue done" "$EV/hw_queue_r4b.log" 2>/dev/null; do sleep 60; done
log "r4b done; starting damerau_sq16m_probe"
wait_alive
timeout 2400 python -u experiments/damerau_sq16m_probe.py \
  > "$EV/damerau_sq16m_probe_r4.log" 2>&1
log "sq16m probe rc=$?"
log "queue done"
