#!/bin/bash
# Round-4 hardware-validation queue: run serially (one TPU process at a
# time), ping-gated between steps because the tunnel flaps.  Output to
# experiments/evidence/.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r4.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue start"
wait_alive
log "smoke start"
timeout 14400 python -u tools/hw_smoke.py --timeout 420 \
  --out "$EV/hw_smoke_r4.log" >> "$EV/hw_smoke_r4_stdout.log" 2>&1
log "smoke rc=$?"
wait_alive
timeout 900 python -u experiments/i16_ops_probe.py \
  > "$EV/i16_ops_probe_r4.log" 2>&1
log "i16 probe rc=$?"
wait_alive
timeout 2400 python -u experiments/damerau_long_r4.py \
  > "$EV/damerau_long_r4.log" 2>&1
log "damerau long rc=$?"
wait_alive
timeout 2000 python -u bench.py > "$EV/bench_r4_run1.json" \
  2> "$EV/bench_r4_run1.log"
log "bench rc=$?"
log "queue done"
