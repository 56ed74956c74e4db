#!/bin/bash
# Round-4 session-2 TPU work queue. One TPU claimant at a time.
cd /root/repo
log() { echo "=== $1 $(date +%T) ===" >> runs/parity_chain.log; }
run() { log "START $1 ep=$2"; timeout $3 python tools/parity_run.py $1 $2 > runs/parity_$1.log 2>&1; log "DONE $1 rc=$?"; }
run obb 150 4500
run segment 150 5400
run rtdetr 100 7200
run v10 150 4500
run world 100 5400
echo ALL_DONE >> runs/parity_chain.log
