#!/bin/bash
# Round-4 follow-up hardware queue: waits for hw_queue_r4.sh to log
# "queue done", then runs the banded-LCS speed probe (ROADMAP lead 2 —
# r3 crossover rows were staging-polluted; 9b4fec5 stages tables outside
# the timed window).  Same ping-gated one-process-at-a-time discipline.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4b.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "waiting for hw_queue_r4"
until grep -q "queue done" "$EV/hw_queue_r4.log" 2>/dev/null; do sleep 60; done
log "r4 queue done; starting lcs_band_speed"
wait_alive
timeout 2400 python -u experiments/lcs_band_speed.py \
  > "$EV/lcs_band_speed_r4.log" 2>&1
log "lcs_band_speed rc=$?"
log "queue done"
