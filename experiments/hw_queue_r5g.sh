#!/bin/bash
# Round-5 hardware queue, step 7: banded-long Damerau validation + rate,
# then the round's FINAL full gates (complete conformance matrix + all
# smoke routes).
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step7 start"
wait_alive
log "smoke damerau_band_long"
timeout 1800 python -u tools/hw_smoke.py --timeout 600 \
  --routes damerau_band_long \
  --out "$EV/hw_smoke_r5_bandlong.log" \
  >> "$EV/hw_smoke_r5_bandlong_stdout.log" 2>&1
log "smoke bandlong rc=$?"
wait_alive
log "conformance damerau_band_long"
timeout 2400 python -u tools/hw_conformance.py --timeout 1200 \
  --checks damerau_band_long \
  --out "$EV/hw_conformance_r5_bandlong.log" \
  >> "$EV/hw_conformance_r5_bandlong_stdout.log" 2>&1
log "conformance bandlong rc=$?"
wait_alive
log "band-long rate probe"
timeout 2400 python -u experiments/damerau_band_long_rate.py \
  > "$EV/damerau_band_long_rate_r5.log" 2>&1
log "bandlong rate rc=$?"
wait_alive
log "FINAL full conformance matrix"
timeout 14400 python -u tools/hw_conformance.py --timeout 1800 \
  --out "$EV/hw_conformance_r5_final.log" \
  >> "$EV/hw_conformance_r5_final_stdout.log" 2>&1
log "final conformance rc=$?"
wait_alive
log "FINAL full smoke"
timeout 14400 python -u tools/hw_smoke.py --timeout 600 \
  --out "$EV/hw_smoke_r5_final.log" \
  >> "$EV/hw_smoke_r5_final_stdout.log" 2>&1
log "final smoke rc=$?"
log "queue r5 step7 done"
