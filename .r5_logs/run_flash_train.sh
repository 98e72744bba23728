#!/bin/bash
# VERDICT r4 item 1: flash-attention training A/B in the real CLAPDAE step
cd /root/repo
set -x
# Control: same-day XLA path at B=16 (baseline r3: 431.8 ms, MFU 0.354)
AA_TRAIN_FLASH=0 timeout 3000 python tools/bench_train.py --only clapdae --clapdae-batch 16 --skip-encode --iters 5 > .r5_logs/flash0_b16.json 2> .r5_logs/flash0_b16.err
# Flash at B=16 (direct A/B)
AA_TRAIN_FLASH=1 timeout 3000 python tools/bench_train.py --only clapdae --clapdae-batch 16 --skip-encode --iters 5 > .r5_logs/flash1_b16.json 2> .r5_logs/flash1_b16.err
# Flash largest-fit: start at 64, halves on OOM
AA_TRAIN_FLASH=1 timeout 6000 python tools/bench_train.py --only clapdae --clapdae-batch 64 --skip-encode --iters 5 > .r5_logs/flash1_b64.json 2> .r5_logs/flash1_b64.err
echo DONE
