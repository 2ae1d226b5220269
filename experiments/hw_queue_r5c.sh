#!/bin/bash
# Round-5 hardware queue, step 3: re-validate the optimized banded
# Damerau kernel (fused char-window shift + mask-free main loop), the
# 16M indelband phase, and partial's amortization variance.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step3 start"
wait_alive
log "smoke damerau_band (optimized kernel)"
timeout 1800 python -u tools/hw_smoke.py --timeout 600 \
  --routes damerau_band \
  --out "$EV/hw_smoke_r5_damband2.log" \
  >> "$EV/hw_smoke_r5_damband2_stdout.log" 2>&1
log "smoke rc=$?"
wait_alive
log "bench phase damband (optimized)"
timeout 900 python -u bench.py --phase damband \
  > "$EV/bench_r5_damband2.log" 2>&1
log "damband2 rc=$?"
wait_alive
log "bench phase indelband (16M)"
timeout 900 python -u bench.py --phase indelband \
  > "$EV/bench_r5_indelband2.log" 2>&1
log "indelband2 rc=$?"
wait_alive
log "bench phase partial (variance check)"
timeout 900 python -u bench.py --phase partial \
  > "$EV/bench_r5_partial2.log" 2>&1
log "partial2 rc=$?"
log "queue r5 step3 done"
