#!/bin/bash
# Waits for the running r3_queue3.sh (pid passed as $1) to exit, then runs
# r3_queue4.sh. Serial — never two pythons on the one host core.
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 60; done
bash scripts/r3_queue4.sh > workspace/logs/r3_queue4.log 2>&1
echo CHAIN_DONE
