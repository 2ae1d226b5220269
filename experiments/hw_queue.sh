#!/bin/bash
# Sequential hardware-validation queue, run once when the axon relay
# returns.  Order matters: cheap exactness checks first, then the bench
# twice (the driver's command), never concurrently (a second TPU process
# makes every phase time out).  All output to experiments/evidence/.
cd /root/repo || exit 1
EV=experiments/evidence
mkdir -p "$EV"
PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONPATH
# share the bench harness's persistent compile cache so every step's
# first-compiles are paid once (jax reads these from the env)
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

log() { echo "$(date -u +%FT%TZ) $*" >> "$EV/hw_queue.log"; }

log "queue start"

# 1) outage-era kernels: Mosaic compile + exactness + small-B rates
timeout 3000 python -u experiments/validate_streams.py \
  > "$EV/validate_streams_r2.log" 2>&1
log "validate_streams rc=$?"

# 2) the driver's bench, twice (VERDICT r1 done-criterion)
timeout 1200 python -u bench.py > "$EV/bench_r2_run2.json" \
  2> "$EV/bench_r2_run2.log"
log "bench run2 rc=$?"
timeout 1200 python -u bench.py > "$EV/bench_r2_run3.json" \
  2> "$EV/bench_r2_run3.log"
log "bench run3 rc=$?"

log "queue done"
