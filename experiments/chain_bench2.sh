#!/bin/bash
# After queue step 7 (final gates), run the full bench again for a clean
# evidence record (+ one retry if rc != 0 or headline failed).
EV=/root/repo/experiments/evidence
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue_r5.log"; }
ping_ok() { timeout 75 python -c "import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:a.sum())(jnp.ones((8,128)))))" >/dev/null 2>&1; }
wait_alive() { until ping_ok; do log "tunnel down; sleep 60"; sleep 60; done; log "tunnel alive"; }
until grep -q "queue r5 step7 done" "$EV/hw_queue_r5.log"; do sleep 120; done
for run in 2 3; do
  wait_alive
  log "full bench run$run"
  BENCH_BUDGET=1500 timeout 2000 python -u bench.py \
    > "$EV/bench_r5_run$run.json" 2> "$EV/bench_r5_run$run.log"
  rc=$?
  log "bench run$run rc=$rc"
  if [ $rc -eq 0 ] && grep -q '"vs_baseline"' "$EV/bench_r5_run$run.json"; then
    break
  fi
done
log "chain bench2 done"
