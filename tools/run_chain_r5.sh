#!/bin/bash
# Round-5 TPU work queue. One TPU claimant at a time.
cd /root/repo
log() { echo "=== $1 $(date +%T) ===" >> runs/parity_chain.log; }
run() { log "START $1 ep=$2"; timeout $3 python tools/parity_run.py $1 $2 > runs/parity_$1.log 2>&1; log "DONE $1 rc=$?"; }
# re-sweep the scales table in REAL bf16: rounds 2-4 unknowingly measured
# fp32 (f32 salt promoted the whole net); every PERF.md roofline row moves
log "START bench_scales_bf16"
timeout 3600 python tools/bench_scales.py --stages --train > runs/bench_scales_bf16.log 2>&1
log "DONE bench_scales_bf16 rc=$?"
# v10/E2E trained parity — unblocked by the round-5 criterion-dispatch fix
run v10 150 5400
# committed benchmark-table artifact (round-4 demand #7): TPU latency columns
log "START bench_table"
timeout 4500 python tools/bench_table.py 40 runs/benchmark_table.md > runs/bench_table_tpu.log 2>&1
log "DONE bench_table rc=$?"
# m-scale train-step roofline + optimization A/B (round-4 demand #6)
log "START bench_m_opt"
timeout 3600 python tools/bench_m_opt.py > runs/bench_m_opt.log 2>&1
log "DONE bench_m_opt rc=$?"
# per-layer roofline decomposition: is the 1.45x gap one slow op or the
# sum of per-shape XLA floors?
log "START bench_m_layers"
timeout 3600 python tools/bench_m_layers.py yolo11m.yaml 128 > runs/bench_m_layers.log 2>&1
log "DONE bench_m_layers rc=$?"
echo ALL_DONE >> runs/parity_chain.log
