#!/bin/bash
# After the parity chain drains: quiet-window m-scale follow-ups (PERF.md
# §scales-roofline promised results), then a TPU bench_table artifact.
cd /root/repo
while ! grep -q ALL_DONE runs/parity_chain.log 2>/dev/null; do sleep 30; done
timeout 2400 python tools/bench_m_opt.py > runs/bench_m_opt.log 2>&1
echo "M_OPT rc=$?" >> runs/parity_chain.log
timeout 2400 python tools/bench_table.py 60 runs/benchmark_table.md > runs/bench_table_tpu.log 2>&1
echo "BENCH_TABLE rc=$?" >> runs/parity_chain.log
