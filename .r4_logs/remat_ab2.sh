#!/bin/bash
# Round-4 item 1 (continued): AA_LDM_REMAT A/B on the chip.
# remat=0 B=16 already measured this morning: 433.2 ms/step, MFU 0.353
# (.r4_logs/remat_ab.log). Remaining configs below. Compiles are ~20 min
# each on today's relay, so budget generously.
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
L=/root/repo/.r4_logs/remat_ab2.log
echo "=== remat=1 B=16 (overhead at same batch) ===" >> $L
AA_LDM_REMAT=1 timeout 3000 python tools/bench_train.py --only clapdae --clapdae-batch 16 --iters 5 --skip-encode >> $L 2>&1
echo "=== remat=1 B=64 (largest-fit probe, halves on OOM) ===" >> $L
AA_LDM_REMAT=1 timeout 4200 python tools/bench_train.py --only clapdae --clapdae-batch 64 --iters 5 --skip-encode >> $L 2>&1
echo "=== remat=0 B=32 (control: does 32 still OOM without remat?) ===" >> $L
AA_LDM_REMAT=0 timeout 3000 python tools/bench_train.py --only clapdae --clapdae-batch 32 --iters 5 --skip-encode >> $L 2>&1
echo "=== DONE ===" >> $L
