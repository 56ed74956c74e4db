#!/bin/bash
# Round-4 TPU work queue (relaunched controller). One TPU claimant at a time.
cd /root/repo
log() { echo "=== $1 $(date +%T) ===" >> runs/parity_chain.log; }
run() { log "START $1 ep=$2"; timeout $3 python tools/parity_run.py $1 $2 > runs/parity_$1.log 2>&1; log "DONE $1 rc=$?"; }
log "BENCH_SCALES start"
timeout 3600 python tools/bench_scales.py --stages --train > runs/bench_scales_r4.log 2>&1
log "BENCH_SCALES rc=$?"
run classify 150 3600
run rtdetr 100 7200
run detect 150 4500
run flagship 150 5400
run v10 150 4500
run world 100 5400
log "START segment-rerun ep=150"
rm -rf runs/parity/segment
timeout 5400 python tools/parity_run.py segment 150 > runs/parity_segment.log 2>&1
log "DONE segment-rerun rc=$?"
echo ALL_DONE >> runs/parity_chain.log
