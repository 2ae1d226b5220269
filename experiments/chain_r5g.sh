#!/bin/bash
# Wait for queue step 6 to finish, then run step 7 (final gates).
EV=/root/repo/experiments/evidence
until grep -q "queue r5 step6 done" "$EV/hw_queue_r5.log"; do sleep 120; done
bash /root/repo/experiments/hw_queue_r5g.sh
