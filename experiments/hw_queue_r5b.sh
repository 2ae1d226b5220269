#!/bin/bash
# Round-5 hardware queue, step 2: validate the new cutoff-banded Damerau
# route + the reworked bench phases on the real chip.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step2 start"
wait_alive
log "smoke damerau_band start"
timeout 1800 python -u tools/hw_smoke.py --timeout 600 \
  --routes damerau_band \
  --out "$EV/hw_smoke_r5_damband.log" \
  >> "$EV/hw_smoke_r5_damband_stdout.log" 2>&1
log "smoke damerau_band rc=$?"
wait_alive
log "conformance damerau_band start"
timeout 2400 python -u tools/hw_conformance.py --timeout 1200 \
  --checks damerau_band \
  --out "$EV/hw_conformance_r5_damband.log" \
  >> "$EV/hw_conformance_r5_damband_stdout.log" 2>&1
log "conformance damerau_band rc=$?"
wait_alive
log "bench phase damband"
timeout 900 python -u bench.py --phase damband \
  > "$EV/bench_r5_damband.log" 2>&1
log "damband rc=$?"
wait_alive
log "bench phase wlev"
timeout 900 python -u bench.py --phase wlev \
  > "$EV/bench_r5_wlev.log" 2>&1
log "wlev rc=$?"
wait_alive
log "bench phase damerau"
timeout 900 python -u bench.py --phase damerau \
  > "$EV/bench_r5_damerau.log" 2>&1
log "damerau rc=$?"
wait_alive
log "bench phase indelband"
timeout 900 python -u bench.py --phase indelband \
  > "$EV/bench_r5_indelband.log" 2>&1
log "indelband rc=$?"
wait_alive
log "bench phase damlong"
timeout 900 python -u bench.py --phase damlong \
  > "$EV/bench_r5_damlong.log" 2>&1
log "damlong rc=$?"
wait_alive
log "bench phase partial"
timeout 900 python -u bench.py --phase partial \
  > "$EV/bench_r5_partial.log" 2>&1
log "partial rc=$?"
log "queue r5 step2 done"
