#!/bin/bash
# Round-5 hardware queue, step 5: staged damband/damerau reruns, the
# streamed-block 8192 Damerau probe + its scanner routes, jaro cap probe.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }

log "queue r5 step5 start"
wait_alive
log "damerau long stream probe (8192 sub64)"
timeout 2400 python -u experiments/damerau_long_stream.py \
  > "$EV/damerau_long_stream_r5.log" 2>&1
log "longstream rc=$?"
wait_alive
log "smoke damerau_long8k (streamed route)"
timeout 1800 python -u tools/hw_smoke.py --timeout 600 \
  --routes damerau_long8k \
  --out "$EV/hw_smoke_r5_long8k.log" \
  >> "$EV/hw_smoke_r5_long8k_stdout.log" 2>&1
log "smoke long8k rc=$?"
wait_alive
log "conformance damerau_long8k (streamed route)"
timeout 2400 python -u tools/hw_conformance.py --timeout 1200 \
  --checks damerau_long8k \
  --out "$EV/hw_conformance_r5_long8k.log" \
  >> "$EV/hw_conformance_r5_long8k_stdout.log" 2>&1
log "conformance long8k rc=$?"
wait_alive
log "bench damband (staged)"
timeout 900 python -u bench.py --phase damband \
  > "$EV/bench_r5_damband4.log" 2>&1
log "damband4 rc=$?"
wait_alive
log "bench damerau (staged)"
timeout 900 python -u bench.py --phase damerau \
  > "$EV/bench_r5_damerau4.log" 2>&1
log "damerau4 rc=$?"
wait_alive
log "bench damlong (streamed)"
timeout 900 python -u bench.py --phase damlong \
  > "$EV/bench_r5_damlong2.log" 2>&1
log "damlong2 rc=$?"
wait_alive
log "jaro stream cap probe"
timeout 3600 python -u experiments/jaro_stream_cap_probe.py \
  > "$EV/jaro_stream_cap_probe_r5.log" 2>&1
log "jarocap rc=$?"
log "queue r5 step5 done"
