#!/bin/bash
# Poll the axon relay port until it answers, then run a tiny device probe.
# Writes status lines to experiments/evidence/tunnel_watch.log.
LOG=/root/repo/experiments/evidence/tunnel_watch.log
echo "$(date -u +%FT%TZ) watch start" >> "$LOG"
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    echo "$(date -u +%FT%TZ) port 8093 OPEN" >> "$LOG"
    if PYTHONPATH=/root/repo:/root/.axon_site timeout 420 python -u -c "
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time(); x=jnp.ones((8,128)); v=float(np.asarray((x+1).sum()))
print('probe ok', v, 'in %.1fs' % (time.time()-t0))
" >> "$LOG" 2>&1; then
      echo "$(date -u +%FT%TZ) TUNNEL UP" >> "$LOG"
      # run the queued hardware validation + bench immediately
      /root/repo/experiments/hw_queue.sh
      echo "$(date -u +%FT%TZ) hw_queue finished" >> "$LOG"
      exit 0
    else
      echo "$(date -u +%FT%TZ) port open but probe failed" >> "$LOG"
    fi
  fi
  sleep 120
done
